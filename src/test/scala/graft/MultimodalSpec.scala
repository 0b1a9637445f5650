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

  test("n_frames is ceil(n_bytes/64), including exact multiples and empty") {
    import spark.implicits._
    val fs = Multimodal.StubCodec.FrameSize // 64
    val payloads = Seq(0, 1, fs - 1, fs, fs + 1, 2 * fs, 2 * fs + 1)
    val media = payloads.zipWithIndex.map { case (len, i) =>
      Multimodal.MediaRow(i.toLong, "utf8-stub", len.toLong, Array.fill(len)('x'.toByte))
    }.toDS().toDF()
    val got = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.n_frames).toMap
    payloads.zipWithIndex.foreach { case (len, i) =>
      val expected = Multimodal.StubCodec.frames(Array.fill(len)('x'.toByte)).size
      assert(got(i.toLong) === expected,
        s"payload of $len bytes: n_frames ${got(i.toLong)} != codec chunk count $expected")
      assert(expected === (len + fs - 1) / fs)
    }
  }

  test("resizePayload crops or zero-pads to exactly the target width") {
    import spark.implicits._
    val target = 16
    val lens = Seq(0, 1, target - 1, target, target + 1, 3 * target)
    val media = lens.zipWithIndex.map { case (len, i) =>
      Multimodal.MediaRow(i.toLong, "utf8-stub", len.toLong,
        Array.tabulate(len)(j => (j % 251 + 1).toByte))
    }.toDS().toDF()
    val got = Multimodal.resizePayload(media, target)
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    lens.zipWithIndex.foreach { case (len, i) =>
      val src = Array.tabulate(len)(j => (j % 251 + 1).toByte)
      val want = src.take(target).padTo(target, 0.toByte)
      assert(got(i.toLong).toSeq === want.toSeq,
        s"payload of $len bytes resized to $target")
    }
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
