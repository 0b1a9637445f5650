package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("packMedia metadata is consistent with the payload") {
    val m = Multimodal.packMedia(Lake(spark, sf0001).documents, "doc_id", "text")
    val bad = m.where(col("n_bytes") =!= octet_length(col("payload"))).count()
    assert(bad === 0)
  }

  test("stub feature extraction is deterministic and normalized") {
    val media = Multimodal.packMedia(Lake(spark, sf0001).documents, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 === f2)
    // histogram features sum to ~1 for non-empty payloads
    assert(f1.values.forall(f => math.abs(f.map(_.toDouble).sum - 1.0) < 1e-3))
  }

  test("frame sampling covers the payload with the right chunk count") {
    val media = Multimodal.packMedia(Lake(spark, sf0001).documents, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, stride = 1).toDF()
    val perDoc = frames.groupBy("media_id").agg(
      count(lit(1)).as("n"),
      sum(octet_length(col("frame"))).as("bytes"))
    val meta = media.select(col("media_id"), col("n_bytes"))
    val bad = perDoc.join(meta, "media_id")
      .where(col("bytes") =!= col("n_bytes") ||
        col("n") =!= ceil(col("n_bytes") / lit(Multimodal.StubCodec.FrameSize.toDouble)))
      .count()
    assert(bad === 0)
  }
}
