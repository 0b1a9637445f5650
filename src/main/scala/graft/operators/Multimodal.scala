package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction / frame-sampling as partition-batched
  * transforms.
  *
  * The Spark-side architecture is the real deliverable here — schema
  * (binary payload + metadata struct), partition-level batching, and the
  * operator signatures — while the actual media decode is STUBBED with a
  * deterministic fake (this environment ships no image/audio codecs; see
  * the builder brief). Swapping [[StubCodec]] for a real decoder changes
  * no plan shape: `mapPartitions` already amortizes per-batch model/codec
  * init exactly like Arrow-batched Python UDFs do.
  */
object Multimodal {

  /** One media row: payload + self-describing metadata. */
  case class MediaRow(media_id: Long, format: String, n_bytes: Long,
                      payload: Array[Byte])

  /** Extracted feature record (fixed-width vector per media row).
    * Carries `n_bytes` through so downstream projections (e.g. exact
    * count recovery from normalized features) need no second scan. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, n_frames: Int,
                           features: Array[Float])

  /** Sampled frame: `frame_idx`-th fixed-size chunk of the payload. */
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Per-frame feature record (decode applied frame-by-frame). */
  case class FrameFeatures(media_id: Long, frame_idx: Int, f3_count: Int)

  /** Deterministic fake codec. A real implementation would wrap an image
    * or audio library behind the same two pure functions. */
  object StubCodec {
    val FrameSize = 64
    /** "Decode" = 8-bin byte histogram normalized to [0,1]. */
    def features(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](8)
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xFF) >> 5) += 1f; i += 1 }
      if (payload.length > 0) (0 until 8).foreach(j => hist(j) /= payload.length)
      hist
    }
    def frames(payload: Array[Byte]): Iterator[(Int, Array[Byte])] =
      payload.grouped(FrameSize).zipWithIndex.map { case (c, i) => (i, c) }
  }

  /** Wrap a text table as a media table: payload = UTF-8 bytes (stand-in
    * for real image/audio bytes), metadata derived from the payload. */
  def packMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit("utf8-stub").as("format"),
      octet_length(encode(col(payloadCol), "UTF-8")).cast(LongType).as("n_bytes"),
      encode(col(payloadCol), "UTF-8").as("payload"))

  /** Exact media dedup at the BINARY layer: annotate every media row
    * with its payload md5, the copy count of that checksum, and a
    * deterministic min-id survivor verdict. This is the checksum dedup a
    * media lake runs before any decode (byte-identical blobs, not
    * perceptual similarity) — one window shuffle keyed on the digest,
    * the media analogue of [[Dedup.dedupExact]] on text fingerprints. */
  def dedupByChecksum(media: DataFrame): DataFrame = {
    val w = Window.partitionBy("checksum")
    Parallelism.ensure(media)
      .withColumn("checksum", md5(col("payload")))
      .select(col("media_id"), col("checksum"),
        count(lit(1)).over(w).as("n_copies"),
        (col("media_id") === min(col("media_id")).over(w)).as("kept"))
  }

  /** Partition-batched feature extraction (the mapInPandas analogue):
    * one codec instantiation per partition, streamed over rows. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    Parallelism.ensure(media).as[MediaRow].mapPartitions { rows =>
      // per-partition codec init would go here (model load, etc.)
      rows.map { r =>
        val f = StubCodec.features(r.payload)
        // ceil(n_bytes / FrameSize), matching StubCodec.frames' chunk
        // count exactly (incl. 0 frames for an empty payload).
        val nFrames = ((r.n_bytes + StubCodec.FrameSize - 1) / StubCodec.FrameSize).toInt
        MediaFeatures(r.media_id, r.n_bytes, nFrames, f)
      }
    }
  }

  /** Frame-level decode: chunk the payload and run the codec on EACH
    * frame (the video-style path — frame sampling composed with feature
    * extraction in one pipelined flatMap, no intermediate frame table).
    * Emits the bin-3 histogram count per frame (bytes 0x60-0x7f),
    * recovered as an exact integer from the float feature. */
  def frameFeatures(media: DataFrame, stride: Int = 1): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    Parallelism.ensure(media).as[MediaRow].flatMap { r =>
      StubCodec.frames(r.payload).filter(_._1 % stride == 0).map { case (i, c) =>
        FrameFeatures(r.media_id, i, Math.round(StubCodec.features(c)(3) * c.length))
      }
    }
  }

  /** Crop-or-pad the payload to exactly `targetBytes` (zero padding) —
    * the resize analogue for opaque media bytes; the normalize-before-
    * batching step that gives downstream feature extraction fixed-width
    * rows. Binary `rpad` truncates when longer and zero-pads when
    * shorter — one codegen'd expression, no UDF. */
  def resizePayload(media: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0)
    media.withColumn("payload", expr(s"rpad(payload, $targetBytes, x'00')"))
      .withColumn("n_bytes", lit(targetBytes.toLong))
  }

  /** Overlapping fixed-width patch tiling — the sliding-window prep step
    * (ViT-style image patches / conv windows over audio bytes): one
    * `patchBytes` window every `stepBytes`, FULL windows only (payloads
    * shorter than a patch yield no rows). Unlike [[sampleFrames]]'
    * disjoint chunks, patches overlap when stepBytes < patchBytes, and
    * the whole tiling is pure expression composition (sequence +
    * transform + posexplode over binary substr) — no lambda closure, no
    * mapPartitions; the planner sees every stage. */
  def tilePatches(media: DataFrame, patchBytes: Int, stepBytes: Int): DataFrame = {
    require(patchBytes > 0 && stepBytes > 0)
    val n = col("n_bytes")
    val nPatches = when(n >= patchBytes,
      floor((n - patchBytes) / stepBytes).cast(IntegerType) + 1).otherwise(0)
    media.select(col("media_id"), col("n_bytes"),
      posexplode(
        when(nPatches >= 1,
          transform(sequence(lit(0), nPatches - 1),
            i => col("payload").substr(i * stepBytes + 1, lit(patchBytes))))
          .otherwise(array().cast(ArrayType(BinaryType))))
        .as(Seq("patch_idx", "patch")))
  }

  /** Frame sampling: every `stride`-th fixed-size chunk, as its own row.
    * flatMap keeps it pipelined — no per-document materialization. */
  def sampleFrames(media: DataFrame, stride: Int = 2): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    Parallelism.ensure(media).as[MediaRow].flatMap { r =>
      StubCodec.frames(r.payload).filter(_._1 % stride == 0)
        .map { case (i, c) => Frame(r.media_id, i, c) }
    }
  }
}
