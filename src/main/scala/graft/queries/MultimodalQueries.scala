package graft.queries

import org.apache.spark.sql.functions._
import graft.Lake
import graft.operators.Multimodal

/** Multimodal-column inventory (SURVEY.md §2b): binary payloads with
  * typed metadata, partition-batched stub decode, frame sampling, and the
  * documents-embeddings multimodal join. All four are DuckDB-oracled:
  * the stub codec is deterministic byte math (8-bin byte histogram +
  * 64-byte chunking), so its outputs are expressible as SQL over the
  * UTF-8 bytes of `text`. Histogram bin 3 (bytes 0x60-0x7f — all
  * single-byte codepoints, so char count == byte count) is compared as
  * an exact integer count recovered from the float feature
  * (`rint(f3 * n_bytes)`; float roundtrip error is ~len*2^-24, far
  * below 0.5), sidestepping cross-engine double-rounding drift.
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

    // ---- exact media dedup by payload checksum -------------------------
    // Byte-layer dedup (the pre-decode checksum pass of a media lake):
    // Spark hashes the BINARY payload, DuckDB hashes the VARCHAR — both
    // are the md5 of the same UTF-8 bytes, so digests match exactly.
    "m8_media_dedup" -> Q(
      (s, dir) => Multimodal.dedupByChecksum(
          Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text"))
        .orderBy("media_id"),
      Some(
        """WITH m AS (SELECT doc_id AS media_id, md5(text) AS checksum
          |           FROM documents)
          |SELECT media_id, checksum,
          |  CAST(count(*) OVER (PARTITION BY checksum) AS BIGINT) AS n_copies,
          |  media_id = min(media_id) OVER (PARTITION BY checksum) AS kept
          |FROM m ORDER BY media_id""".stripMargin)),

    // ---- partition-batched feature extraction (stub codec) -------------
    "m2_media_features" -> Q(
      (s, dir) => Multimodal.extractFeatures(
          Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text"))
        .toDF()
        // n_bytes rides through MediaFeatures — one corpus scan, no
        // second packMedia branch re-encoding the text for a join
        .select(col("media_id"), col("n_frames"),
          round(element_at(col("features"), 4).cast("double") * col("n_bytes"))
            .cast("long").as("f3_count"))
        .orderBy("media_id"),
      Some(
        """SELECT doc_id AS media_id,
          |  CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) AS n_frames,
          |  CAST(length(text) - length(regexp_replace(text, '[\x60-\x7f]', '', 'g'))
          |       AS BIGINT) AS f3_count
          |FROM documents ORDER BY media_id""".stripMargin)),

    // ---- frame sampling (flatMap chunking) ------------------------------
    "m3_frame_sample" -> Q(
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text"),
          stride = 2)
        .toDF()
        .select(col("media_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_bytes"))
        .orderBy("media_id", "frame_idx"),
      Some(
        """WITH m AS (
          |  SELECT doc_id AS media_id,
          |    octet_length(encode(text)) AS n_bytes,
          |    CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) AS nf
          |  FROM documents
          |)
          |SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
          |  CAST(CASE WHEN i = nf - 1 THEN n_bytes - 64 * (nf - 1)
          |       ELSE 64 END AS INTEGER) AS frame_bytes
          |FROM m, unnest([x for x in generate_series(0, nf - 1) if x % 2 = 0]) AS u(i)
          |ORDER BY media_id, frame_idx""".stripMargin)),

    // ---- per-frame decode (frame sampling ∘ feature extraction) --------
    // The oracle counts hex pairs with high nibble 6/7 inside each
    // frame's slice of the payload hex — byte-for-byte the codec's bin 3.
    "m6_frame_features" -> Q(
      (s, dir) => Multimodal.frameFeatures(
          Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text"))
        .toDF()
        .orderBy("media_id", "frame_idx"),
      Some(
        """WITH m AS (
          |  SELECT doc_id AS media_id, upper(hex(encode(text))) AS h,
          |    octet_length(encode(text)) AS n_bytes,
          |    CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) AS nf
          |  FROM documents)
          |SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
          |  CAST(list_sum(
          |    [CASE WHEN substr(h, i * 128 + 2 * j - 1, 1) IN ('6', '7')
          |          THEN 1 ELSE 0 END
          |     for j in generate_series(1,
          |       CASE WHEN i = nf - 1 THEN n_bytes - 64 * (nf - 1) ELSE 64 END)])
          |    AS INTEGER) AS f3_count
          |FROM m, unnest(generate_series(0, nf - 1)) AS u(i)
          |ORDER BY media_id, frame_idx""".stripMargin)),

    // ---- overlapping patch tiling (sliding windows, expression-only) ---
    // 48-byte patches every 32 bytes -> adjacent patches share 16 bytes.
    // Content verified byte-exact via md5 over each patch's hex slice.
    "m7_patch_tiling" -> Q(
      (s, dir) => Multimodal.tilePatches(
          Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text"),
          patchBytes = 48, stepBytes = 32)
        .select(col("media_id"), col("patch_idx"),
          (col("patch_idx") * 32).cast("int").as("patch_start"),
          md5(upper(hex(col("patch")))).as("patch_md5"))
        .orderBy("media_id", "patch_idx"),
      Some(
        """WITH m AS (
          |  SELECT doc_id AS media_id, upper(hex(encode(text))) AS h,
          |    octet_length(encode(text)) AS n_bytes
          |  FROM documents),
          |p AS (
          |  SELECT media_id, h,
          |    CASE WHEN n_bytes >= 48 THEN (n_bytes - 48) // 32 + 1
          |         ELSE 0 END AS np
          |  FROM m)
          |SELECT media_id, CAST(i AS INTEGER) AS patch_idx,
          |  CAST(i * 32 AS INTEGER) AS patch_start,
          |  md5(substr(h, i * 64 + 1, 96)) AS patch_md5
          |FROM p, unnest(generate_series(0, np - 1)) AS u(i)
          |ORDER BY media_id, patch_idx""".stripMargin)),

    // ---- payload resize (crop-or-pad to fixed width) -------------------
    // Content verified byte-exact via md5 over the hex rendering (DuckDB
    // cannot slice blobs, but the hex-domain crop/pad is the same bytes).
    "m5_media_resize" -> Q(
      (s, dir) => Multimodal.resizePayload(
          Multimodal.packMedia(Lake(s, dir).documents, "doc_id", "text"), 128)
        .select(col("media_id"),
          octet_length(col("payload")).as("out_len"),
          md5(upper(hex(col("payload")))).as("content_md5"))
        .orderBy("media_id"),
      Some(
        """SELECT doc_id AS media_id, CAST(128 AS INTEGER) AS out_len,
          |  md5(rpad(substr(upper(hex(encode(text))), 1, 256), 256, '0'))
          |    AS content_md5
          |FROM documents ORDER BY media_id""".stripMargin)),

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
