package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Lake(spark, sf0001).documents.select("doc_id")

  test("hashKeep boundary: 0 keeps nothing, 16 keeps everything") {
    val n = docs.count()
    assert(Sampling.hashSample(docs.toDF(), "doc_id", 0).count() === 0)
    assert(Sampling.hashSample(docs.toDF(), "doc_id", 16).count() === n)
  }

  test("hashKeep is monotone in sixteenths and roughly proportional") {
    val n = docs.count().toDouble
    val counts = (0 to 16).map(s =>
      Sampling.hashSample(docs.toDF(), "doc_id", s).count())
    // membership at s is a subset of membership at s+1 => counts nondecreasing
    assert(counts === counts.sorted)
    // each step keeps roughly n/16 more (md5 uniformity; generous tolerance)
    (1 to 16).foreach { s =>
      val frac = counts(s) / n
      assert(math.abs(frac - s / 16.0) < 0.12,
        s"sixteenths=$s kept fraction $frac, expected ~${s / 16.0}")
    }
  }

  test("hashKeep membership is invariant under repartitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(Sampling.hashSample(docs.toDF(), "doc_id", 4))
    val reparted = ids(Sampling.hashSample(docs.toDF().repartition(7), "doc_id", 4))
    assert(base === reparted)
    assert(base.nonEmpty)
  }

  test("stratified drops absent strata and honors per-stratum boundaries") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang")
    val out = Sampling.stratified(df, "lang", "id", Map("en" -> 16, "fr" -> 0))
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs === Set("en"))
    assert(out.count() === 200) // en fully kept, fr fully dropped
  }
}
