package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** The native bounded-heap top-k-per-group operator (custom logical node
  * → strategy → partial+final SparkPlan) must reproduce the window form
  * exactly — on the fixture, on randomized data, ascending and
  * descending, k under and over the group size — and must PLAN as
  * partial → one hash exchange → final.
  */
class TopKPerGroupSpec extends SparkSpec {

  private def windowForm(df: DataFrame, group: String, score: String,
      desc: Boolean, tie: String, k: Int): DataFrame = {
    val ord = if (desc) Seq(col(score).desc, col(tie)) else
      Seq(col(score).asc, col(tie))
    df.withColumn("rn",
        row_number().over(Window.partitionBy(col(group)).orderBy(ord: _*)))
      .filter(col("rn") <= k).drop("rn")
  }

  private def sortedRows(df: DataFrame, cols: String*): Array[String] =
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.mkString("|")).sorted

  test("fixture: native top-3 orders per customer == window form") {
    val base = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val native = TopKPerGroup(base, Seq("o_custkey"), "o_totalprice",
      descending = true, "o_orderkey", 3)
    val window = windowForm(base, "o_custkey", "o_totalprice",
      desc = true, "o_orderkey", 3)
    assert(sortedRows(native, "o_custkey", "o_orderkey", "o_totalprice")
      .sameElements(
        sortedRows(window, "o_custkey", "o_orderkey", "o_totalprice")))
  }

  test("randomized: equivalence across k, direction, duplicate scores") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // duplicate-heavy scores force the tie-break to carry the ordering
    val rows = Seq.tabulate(5000)(i =>
      (rng.nextInt(40).toLong, i.toLong, rng.nextInt(25).toDouble))
    val df = rows.toDF("g", "id", "score").repartition(7)
    for (k <- Seq(1, 4, 1000); desc <- Seq(true, false)) {
      val native = TopKPerGroup(df, Seq("g"), "score", desc, "id", k)
      val window = windowForm(df, "g", "score", desc, "id", k)
      assert(sortedRows(native, "g", "id", "score")
        .sameElements(sortedRows(window, "g", "id", "score")),
        s"mismatch at k=$k desc=$desc")
    }
  }

  test("plan: partial pass, exactly one exchange, final pass — " +
    "and the exchange carries at most k·groups·parts rows") {
    val base = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val native = TopKPerGroup(base, Seq("o_custkey"), "o_totalprice",
      descending = true, "o_orderkey", 3)
    native.collect()
    // AQE's toString prints final AND initial plans — assert on final only
    val p = native.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("TopKPerGroupPartial"), p)
    assert(p.contains("TopKPerGroupFinal"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    // the partial heap must actually shrink the exchange: shuffle
    // records written < input rows (1.5k orders at sf0.001, vs
    // customers × k=3 × parts survivors). AQE hides the exchange inside
    // query stages, so walk every nested plan.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case q: QueryStageExec => allNodes(q.plan)
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case _ => Nil
      })
    val inputRows = Tables.orders(spark, sf0001).count()
    val shuffleWritten = allNodes(native.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike =>
        e.metrics.collect {
          case (name, m) if name.toLowerCase.contains("records") => m.value
        }.sum
      }.sum
    assert(shuffleWritten > 0 && shuffleWritten < inputRows,
      s"shuffle carried $shuffleWritten of $inputRows input rows")
  }

  test("k exceeding every group size returns the child rows exactly") {
    import spark.implicits._
    val df = Seq((1L, 1L, 2.0), (1L, 2L, 1.0), (2L, 3L, 5.0))
      .toDF("g", "id", "score")
    val native = TopKPerGroup(df, Seq("g"), "score", descending = true,
      "id", 10)
    assert(native.count() == 3)
  }

  test("DECIMAL score orders by the type's own ordering (stress fixture " +
    "regression: orders.o_totalprice ships as DECIMAL there)") {
    import spark.implicits._
    val df = Seq((1L, 1L, "10.10"), (1L, 2L, "10.05"), (1L, 3L, "9.99"),
      (2L, 4L, "3.50"))
      .toDF("g", "id", "s")
      .withColumn("score", col("s").cast("decimal(18,2)")).drop("s")
    val native = TopKPerGroup(df, Seq("g"), "score", descending = true,
      "id", 2)
    val got = native.select("g", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (1L, 2L), (2L, 4L)))
  }

  test("group-cardinality overflow: partial pass degrades to passthrough " +
    "with the answer unchanged") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(3000)(i =>
      (rng.nextInt(500).toLong, i.toLong, rng.nextInt(40).toDouble))
    val df = rows.toDF("g", "id", "score").repartition(5)
    val key = "spark.graft.topk.maxGroupsPerTask"
    spark.conf.set(key, "7") // force overflow in every task
    try {
      val native = TopKPerGroup(df, Seq("g"), "score",
        descending = true, "id", 2)
      // collect the SAME plan whose metrics we inspect below (a derived
      // select would execute a clone and leave these metrics at zero)
      val got = native.collect()
        .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getDouble(2)}")
        .sorted
      val want = sortedRows(
        windowForm(df, "g", "score", desc = true, "id", 2),
        "g", "id", "score")
      assert(got.sameElements(want))
      // the fallback actually fired: passthrough metric non-zero
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] =
        (p +: p.children.flatMap(allNodes)) ++ (p match {
          case q: QueryStageExec => allNodes(q.plan)
          case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
          case _ => Nil
        })
      val passed = allNodes(native.queryExecution.executedPlan)
        .collect { case e: graft.plans.TopKPerGroupExec if e.partial =>
          e.metrics("numPassthroughRows").value }.sum
      assert(passed > 0, "expected the overflow passthrough to fire")
    } finally spark.conf.unset(key)
  }

  test("buffer-backed score types (struct, array) survive the reused " +
    "projection buffer — copied per-entry, not aliased") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    // many rows per group with DISTINCT struct scores: if the heap held
    // views into the reused UnsafeProjection buffer, later rows would
    // silently overwrite earlier entries' scores and the kept set drifts
    val rows = Seq.tabulate(4000)(i =>
      (rng.nextInt(20).toLong, i.toLong, rng.nextInt(10), rng.nextInt(100)))
    val base = rows.toDF("g", "id", "maj", "min")
    val structDf = base.withColumn("score",
      struct(col("maj"), col("min"))).drop("maj", "min")
    val arrayDf = base.withColumn("score",
      array(col("maj"), col("min"))).drop("maj", "min")
    for ((df, label) <- Seq((structDf, "struct"), (arrayDf, "array"))) {
      val native = TopKPerGroup(df, Seq("g"), "score",
        descending = true, "id", 3)
      val window = windowForm(df, "g", "score", desc = true, "id", 3)
      // unique tie ⇒ the kept id set fully determines correctness
      assert(sortedRows(native, "g", "id")
        .sameElements(sortedRows(window, "g", "id")),
        s"$label-scored top-k diverged from the window form")
    }
  }

  test("NaN scores rank largest, matching the window form's ordering") {
    import spark.implicits._
    val df = Seq((1L, 1L, 2.0), (1L, 2L, Double.NaN), (1L, 3L, 5.0),
      (1L, 4L, Double.NaN))
      .toDF("g", "id", "score")
    val native = TopKPerGroup(df, Seq("g"), "score", descending = true,
      "id", 2)
    val window = windowForm(df, "g", "score", desc = true, "id", 2)
    assert(sortedRows(native, "g", "id")
      .sameElements(sortedRows(window, "g", "id")))
    // both NaNs (ties broken by id) beat every finite score
    assert(native.select("id").collect().map(_.getLong(0)).toSet
      === Set(2L, 4L))
  }

  test("empty group list refuses with a clear message") {
    import spark.implicits._
    val df = Seq((1L, 1L, 2.0)).toDF("g", "id", "score")
    val ex = intercept[Exception] {
      TopKPerGroup(df, Seq.empty, "score", descending = true, "id", 1)
    }
    assert(ex.getMessage.contains("at least one group column"))
  }

  test("null score refuses loudly instead of ranking nulls") {
    import spark.implicits._
    val df = Seq((1L, 1L, Some(2.0)), (1L, 2L, None))
      .toDF("g", "id", "score")
    val ex = intercept[Exception] {
      TopKPerGroup(df, Seq("g"), "score", descending = true, "id", 1)
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
