package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.operators.CurationOps

/** Property tests for [[CurationOps.canonicalUrl]]: canonicalization
  * must be IDEMPOTENT (the defining property — a canonical key that
  * keeps moving under its own function cannot dedup anything), and its
  * output must never retain the noise classes it claims to strip
  * (scheme, fragment, utm params, trailing slash, case). Random URL-ish
  * strings explore the regex edges (empty queries, repeated '?',
  * dangling separators) the hand-written spot checks can't enumerate.
  */
object CanonicalUrlProps extends Properties("canonicalUrl") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  private val hostGen = for {
    name <- Gen.oneOf("Example.org", "a.com", "CDN.site.NET")
  } yield name
  private val paramGen = Gen.oneOf(
    "a=1", "b=2", "z=", "utm_source=feed", "utm_campaign=X", "ref=7", "")
  private val urlGen = for {
    scheme <- Gen.oneOf("https://", "http://", "")
    host <- hostGen
    segs <- Gen.choose(0, 3)
    path <- Gen.listOfN(segs, Gen.oneOf("x", "Y1", "article-9"))
    slash <- Gen.oneOf("", "/", "//")
    qMark <- Gen.oneOf(true, false)
    params <- Gen.listOfN(3, paramGen)
    frag <- Gen.oneOf("", "#top", "#a?b")
  } yield scheme + host + path.map("/" + _).mkString + slash +
    (if (qMark) "?" + params.mkString("&") else "") + frag

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(CurationOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  property("idempotent: canon(canon(u)) == canon(u)") =
    forAll(Gen.listOfN(12, urlGen)) { urls =>
      val once = canon(urls)
      canon(once) == once
    }

  property("output strips scheme, fragment, utm params, trailing slash; " +
    "host (and only host) is case-folded") =
    forAll(Gen.listOfN(12, urlGen)) { urls =>
      canon(urls).forall { c =>
        val host = c.takeWhile(ch => ch != '/' && ch != '?')
        !c.startsWith("http://") && !c.startsWith("https://") &&
          !c.contains("#") && !c.contains("utm_") &&
          !c.stripSuffix("?").endsWith("/") &&
          host == host.toLowerCase
      }
    }
}
