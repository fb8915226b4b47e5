package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the engine's native Catalyst expressions. Two paths:
  *
  *  - [[GraftFunctions.register]]: imperative, idempotent, called by any
  *    operator that uses the functions (works on an already-built session);
  *  - [[GraftExtensions]]: the `SparkSessionExtensions` route for
  *    cluster-wide installation via
  *    `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  /** Fixed-seed parameters for the 60 minhash permutations — the LSH
    * banding (10 bands × 6 rows) in graft.operators.DedupOps depends on
    * exactly these.
    */
  val (minhashAs, minhashBs): (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(42)
    val pairs = Seq.fill(60)((1L + rng.nextInt(Int.MaxValue - 1).toLong,
      1L + rng.nextInt(Int.MaxValue - 1).toLong))
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  private def dotInfo = new ExpressionInfo(
    classOf[DotProduct].getName, "graft_dot")
  private def dotBuilder(children: Seq[Expression]): Expression =
    DotProduct(children(0), children(1))

  private def minhashInfo = new ExpressionInfo(
    classOf[MinHash].getName, "graft_minhash")
  private def minhashBuilder(children: Seq[Expression]): Expression =
    MinHash(children.head, minhashAs, minhashBs)

  private def simhashInfo = new ExpressionInfo(
    classOf[SimHash].getName, "graft_simhash")

  /** `graft_pq_encode(embedding, codebookLiteral)`: the codebook child
    * must be FOLDABLE (a `typedlit` of the cb(m)(k)(i) nested array) —
    * it is evaluated ONCE at resolution into [[PqEncode]]'s constructor
    * constant, so the generated per-row loop indexes a flat JVM double[]
    * instead of re-walking a plan literal.
    */
  private[functions] def pqEncodeBuilder(
      children: Seq[Expression]): Expression = {
    require(children.size == 2,
      "graft_pq_encode takes (embedding, codebook)")
    require(children(1).foldable,
      "graft_pq_encode codebook must be a foldable literal")
    // validate the literal's TYPE before evaluating it — a mistyped
    // codebook (e.g. array<array<double>> or integer cells) would
    // otherwise surface as a raw ClassCastException out of getArray
    children(1).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, _), _), _) => ()
      case t => throw new IllegalArgumentException(
        "graft_pq_encode codebook must be array<array<array<double>>> " +
          s"(cb(m)(k)(i)), got ${t.catalogString}")
    }
    val outer = children(1).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val cb = Array.tabulate(outer.numElements()) { m =>
      val mid = outer.getArray(m)
      Array.tabulate(mid.numElements())(k => mid.getArray(k).toDoubleArray())
    }
    PqEncode(children(0), cb)
  }

  /** Idempotent per-session registration (overwrites any prior binding). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("graft_dot"), dotInfo,
      dotBuilder _)
    reg.registerFunction(FunctionIdentifier("graft_minhash"), minhashInfo,
      minhashBuilder _)
    reg.registerFunction(FunctionIdentifier("graft_simhash"), simhashInfo,
      (children: Seq[Expression]) => SimHash(children.head))
    reg.registerFunction(FunctionIdentifier("graft_simhash_portable"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash_portable"),
      (children: Seq[Expression]) => SimHash(children.head, portable = true))
    reg.registerFunction(FunctionIdentifier("graft_minhash_tokens"),
      new ExpressionInfo(classOf[MinHashTokens].getName,
        "graft_minhash_tokens"),
      (children: Seq[Expression]) =>
        MinHashTokens(children.head, minhashAs, minhashBs))
    reg.registerFunction(FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles"),
      (children: Seq[Expression]) => ShingleSet(children.head))
    reg.registerFunction(FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName,
        "graft_fingerprint"),
      (children: Seq[Expression]) => RollingFingerprint(children.head))
    reg.registerFunction(FunctionIdentifier("graft_fingerprint_portable"),
      new ExpressionInfo(classOf[RollingFingerprint].getName,
        "graft_fingerprint_portable"),
      (children: Seq[Expression]) =>
        RollingFingerprint(children.head, portable = true))
    reg.registerFunction(FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      (children: Seq[Expression]) => PqAdc(children(0), children(1)))
    reg.registerFunction(FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      pqEncodeBuilder _)
    // optimizer rule on a live session (extensions only bind at build time)
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
  }
}

/** `spark.sql.extensions` entry point installing the native functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHash].getName, "graft_minhash"),
      (children: Seq[Expression]) =>
        MinHash(children.head, GraftFunctions.minhashAs,
          GraftFunctions.minhashBs)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_simhash_portable"),
      new ExpressionInfo(classOf[SimHash].getName, "graft_simhash_portable"),
      (children: Seq[Expression]) => SimHash(children.head, portable = true)))
    ext.injectFunction((FunctionIdentifier("graft_minhash_tokens"),
      new ExpressionInfo(classOf[MinHashTokens].getName,
        "graft_minhash_tokens"),
      (children: Seq[Expression]) =>
        MinHashTokens(children.head, GraftFunctions.minhashAs,
          GraftFunctions.minhashBs)))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles"),
      (children: Seq[Expression]) => ShingleSet(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName,
        "graft_fingerprint"),
      (children: Seq[Expression]) => RollingFingerprint(children.head)))
    ext.injectFunction((FunctionIdentifier("graft_fingerprint_portable"),
      new ExpressionInfo(classOf[RollingFingerprint].getName,
        "graft_fingerprint_portable"),
      (children: Seq[Expression]) =>
        RollingFingerprint(children.head, portable = true)))
    ext.injectFunction((FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      (children: Seq[Expression]) => PqAdc(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      GraftFunctions.pqEncodeBuilder _))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
