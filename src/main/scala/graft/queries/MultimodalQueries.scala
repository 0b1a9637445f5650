package graft.queries

import org.apache.spark.sql.functions._
import graft.Lake
import graft.operators.Multimodal

/** Multimodal-column inventory (SURVEY.md §2b): binary payloads with
  * typed metadata, partition-batched stub decode, frame sampling, and the
  * documents-embeddings multimodal join. The metadata path (m1) is
  * oracled; decode outputs (m2-m4) depend on the stub codec and are
  * rows-only, with their determinism pinned by the test suite.
  */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(

    // ---- binary payload + metadata assembly ----------------------------
    "m1_media_meta" -> Q(
      (s, dir) => Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text")
        .select("media_id", "format", "n_bytes")
        .orderBy("media_id"),
      Some(
        """SELECT doc_id AS media_id, 'utf8-stub' AS format,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
          |FROM documents ORDER BY media_id""".stripMargin)),

    // ---- partition-batched feature extraction (stub codec) -------------
    "m2_media_features" -> Q(
      (s, dir) => Multimodal.extractFeatures(
          Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("n_frames"),
          round(element_at(col("features"), 1).cast("double"), 5).as("f0"))
        .orderBy("media_id"),
      None),

    // ---- frame sampling (flatMap chunking) ------------------------------
    "m3_frame_sample" -> Q(
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text"),
          stride = 2)
        .toDF()
        .select(col("media_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_bytes"))
        .orderBy("media_id", "frame_idx"),
      None),

    // ---- multimodal join: text + embedding as one struct row -----------
    "m4_multimodal_join" -> Q(
      (s, dir) => {
        val lk = Lake(s, dir)
        lk.documents
          .join(lk.embeddings, col("doc_id") === col("vec_id"), "inner")
          .select(col("doc_id"),
            struct(col("text"), col("lang"), col("embedding")).as("sample"))
          .select(col("doc_id"),
            length(col("sample.text")).as("text_len"),
            size(col("sample.embedding")).as("dim"),
            col("sample.lang").as("lang"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id, CAST(length(text) AS INTEGER) AS text_len,
          |  CAST(len(embedding) AS INTEGER) AS dim, lang
          |FROM documents JOIN embeddings ON doc_id = vec_id
          |ORDER BY doc_id""".stripMargin))
  )
}
