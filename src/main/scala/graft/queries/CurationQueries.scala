package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.Lake
import graft.operators.Curation

/** The end-to-end curation pipeline (SURVEY.md §2b capstone): every stage
  * is individually oracled elsewhere (t1 langid, t2 quality, t4
  * fingerprint, d1 dedup, t8 sampling); `c1` oracles the COMPOSITION so
  * stage wiring (filter order, survivor choice, sample-after-dedup) is
  * cell-exact too. */
object CurationQueries {

  val defs: Map[String, Q] = Map(

    // Scaling note (round 7): the round-6 bench recorded a 9.22 sf0.1/
    // sf0.01 ratio for c1 — re-measured in isolation with reps=7
    // (SPARK_GRAFT_BENCH_ONLY=c1_curation), the ratio is 2.25 (best 1.13s
    // vs 0.50s). The outlier was the sf0.01-side in-suite best landing
    // anomalously fast, not a super-linear stage: the chain is one
    // regex-annotate map + one fp-keyed window + a hash filter, all
    // linear in rows.
    "c1_curation" -> Q(
      (s, dir) => Curation.curate(Lake(s, dir).documents, "doc_id", "text",
          Curation.Config(minQuality = 0.5, dropUnknownLang = true,
            sampleSixteenths = 8))
        .select("doc_id", "lang_pred", "quality", "n_tokens", "fp")
        .orderBy("doc_id"),
      Some(
        """WITH annotated AS (
          |  SELECT doc_id,
          |    CASE WHEN en = 0 AND es = 0 AND de = 0 THEN 'unk'
          |         WHEN en >= es AND en >= de THEN 'en'
          |         WHEN es >= de THEN 'es'
          |         ELSE 'de' END AS lang_pred,
          |      least(CAST(ntok AS DOUBLE) / 100.0, 1.0) * 0.5
          |    + (CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok ELSE 0.0 END) * 0.3
          |    + (1.0 - CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars ELSE 0.0 END) * 0.2
          |      AS quality,
          |    CAST(ntok AS BIGINT) AS n_tokens,
          |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          |  FROM (
          |    SELECT doc_id, text,
          |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS en,
          |      len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en|los)\b')) AS es,
          |      len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|von)\b')) AS de,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
          |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
          |      length(text) AS nchars
          |    FROM documents) t
          |), filtered AS (
          |  SELECT * FROM annotated WHERE quality >= 0.5 AND lang_pred != 'unk'
          |), deduped AS (
          |  SELECT doc_id, lang_pred, quality, n_tokens, fp FROM (
          |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          |    FROM filtered) d
          |  WHERE rn = 1
          |)
          |SELECT doc_id, lang_pred, quality, n_tokens, fp FROM deduped
          |WHERE md5(fp) < '8'
          |ORDER BY doc_id""".stripMargin),
      headline = true),

    // ---- language-balanced curation (stratified final sample) ----------
    // Downsample dominant en hard, keep most es, all de; the oracle
    // composes the identical chain with the per-stratum thresholds.
    "c2_curation_balanced" -> Q(
      (s, dir) => Curation.curateBalanced(Lake(s, dir).documents,
          "doc_id", "text", Map("en" -> 2, "es" -> 8, "de" -> 16),
          Curation.Config(minQuality = 0.5, dropUnknownLang = true))
        .select("doc_id", "lang_pred", "quality", "n_tokens", "fp")
        .orderBy("doc_id"),
      Some(
        """WITH annotated AS (
          |  SELECT doc_id,
          |    CASE WHEN en = 0 AND es = 0 AND de = 0 THEN 'unk'
          |         WHEN en >= es AND en >= de THEN 'en'
          |         WHEN es >= de THEN 'es'
          |         ELSE 'de' END AS lang_pred,
          |      least(CAST(ntok AS DOUBLE) / 100.0, 1.0) * 0.5
          |    + (CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok ELSE 0.0 END) * 0.3
          |    + (1.0 - CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars ELSE 0.0 END) * 0.2
          |      AS quality,
          |    CAST(ntok AS BIGINT) AS n_tokens,
          |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          |  FROM (
          |    SELECT doc_id, text,
          |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS en,
          |      len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en|los)\b')) AS es,
          |      len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|von)\b')) AS de,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
          |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
          |      length(text) AS nchars
          |    FROM documents) t
          |), filtered AS (
          |  SELECT * FROM annotated WHERE quality >= 0.5 AND lang_pred != 'unk'
          |), deduped AS (
          |  SELECT doc_id, lang_pred, quality, n_tokens, fp FROM (
          |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          |    FROM filtered) d
          |  WHERE rn = 1
          |)
          |SELECT doc_id, lang_pred, quality, n_tokens, fp FROM deduped
          |WHERE (lang_pred = 'en' AND md5(fp) < '2')
          |   OR (lang_pred = 'es' AND md5(fp) < '8')
          |   OR (lang_pred = 'de')
          |ORDER BY doc_id""".stripMargin)),

    // ---- source-level filtering (domain-style curation verdicts) -------
    // Per-source volume + mean-quality gate computed entirely in the
    // integer domain (floor(quality*1e6) per row, BIGINT sums, the mean
    // test cross-multiplied) so the verdict is exact and independent of
    // partial-aggregation order — the property a double avg() would lose.
    "c3_source_filter" -> Q(
      (s, dir) => Curation.sourceStats(Lake(s, dir).documents,
          "source", "text", minDocs = 5L, minAvgQuality = 0.49)
        .orderBy("source"),
      Some(
        """WITH q AS (
          |  SELECT source,
          |    CAST(floor((
          |        least(CAST(ntok AS DOUBLE) / 100.0, 1.0) * 0.5
          |      + (CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok ELSE 0.0 END) * 0.3
          |      + (1.0 - CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars ELSE 0.0 END) * 0.2
          |    ) * 1e6) AS BIGINT) AS q_micro
          |  FROM (
          |    SELECT source,
          |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
          |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
          |      length(text) AS nchars
          |    FROM documents) t)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(q_micro) AS BIGINT) AS sum_q_micro,
          |  (count(*) >= 5 AND CAST(sum(q_micro) AS BIGINT) >= count(*) * 490000)
          |    AS kept
          |FROM q GROUP BY source ORDER BY source""".stripMargin)),

    // ---- sequence packing (concat-and-chunk, per-language strata) ------
    // Each doc's first token lands in pack start_off DIV 512 of its
    // language's concatenated token stream; exact integer window math.
    "c4_seq_packing" -> Q(
      (s, dir) => Curation.packSequences(Lake(s, dir).documents,
          "lang", "doc_id", "text", budgetTokens = 512L)
        .orderBy("doc_id"),
      Some(
        """WITH t AS (
          |  SELECT doc_id, lang,
          |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
          |      AS n_tokens
          |  FROM documents),
          |o AS (
          |  SELECT doc_id, lang, n_tokens,
          |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |      AS start_off
          |  FROM t)
          |SELECT doc_id, lang, n_tokens, start_off,
          |  start_off // 512 AS pack_id,
          |  start_off % 512 AS pack_off
          |FROM o ORDER BY doc_id""".stripMargin)),

    // ---- the full training-data pipeline, composed ---------------------
    // Source filter -> benchmark decontamination -> annotate/filter/dedup
    // (c1 chain, sampling off) -> per-language sequence packing. Every
    // stage is individually oracled (c3, d11, c1, c4); this query oracles
    // the COMPOSITION, so stage order and survivor propagation are
    // cell-exact end to end. Production would persist between stages
    // (the one-shot plan re-evaluates the source-filter subtree in both
    // decontamination inputs) — correctness is unaffected.
    "c5_training_pipeline" -> Q(
      (s, dir) => {
        val docs = Lake(s, dir).documents
        val train = docs.where(col("doc_id") % 2 === 0)
        val bench = docs.where(col("doc_id") % 2 === 1)
        // `sourced` feeds three consumers (both decontamination inputs
        // and the final semi join). Materializing the full sourced frame
        // is a loss (a localCheckpoint stage boundary here ran 3.9s vs
        // 2.7s warm at sf0.1 — the full text column costs more to store
        // than the repeated scan it saves), but the SOURCE VERDICT is a
        // handful of strings: checkpointing just the kept-source list
        // (optimization r20, guide §1.2) makes each consumer a bare
        // scan + broadcast semi-join — the per-doc qualityScore pass and
        // its aggregation run once instead of once per consumer.
        // Equivalent to Curation.filterBySource by construction.
        val keptSrc = Curation.sourceStats(train, "source", "text",
            minDocs = 5L, minAvgQuality = 0.49)
          .where(col("kept")).select("source")
          .localCheckpoint(true)
        val sourced = train.join(broadcast(keptSrc), Seq("source"), "left_semi")
        val clean = sourced.join(
          graft.operators.Dedup.decontaminate(sourced, bench, "doc_id", "text",
              shingleN = 5)
            .where(!col("contaminated")).select("doc_id"),
          Seq("doc_id"), "left_semi")
        val curated = Curation.curate(clean, "doc_id", "text",
          Curation.Config(minQuality = 0.5, dropUnknownLang = true,
            sampleSixteenths = 16))
        // the curate stage's annotate struct already carries n_tokens —
        // the counted packer skips a second tokenize of the text column
        Curation.packSequencesCounted(curated, "lang_pred", "doc_id",
            col("n_tokens"), budgetTokens = 256L)
          .orderBy("doc_id")
      },
      Some(
        """WITH q AS (
          |  SELECT doc_id, source,
          |    CAST(floor((
          |        least(CAST(ntok AS DOUBLE) / 100.0, 1.0) * 0.5
          |      + (CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok ELSE 0.0 END) * 0.3
          |      + (1.0 - CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars ELSE 0.0 END) * 0.2
          |    ) * 1e6) AS BIGINT) AS q_micro
          |  FROM (
          |    SELECT doc_id, source,
          |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
          |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
          |      length(text) AS nchars
          |    FROM documents WHERE doc_id % 2 = 0) t),
          |keptsrc AS (
          |  SELECT source FROM q GROUP BY source
          |  HAVING count(*) >= 5
          |     AND CAST(sum(q_micro) AS BIGINT) >= count(*) * 490000),
          |sourced AS (
          |  SELECT d.* FROM documents d JOIN keptsrc USING (source)
          |  WHERE d.doc_id % 2 = 0),
          |tokall AS (
          |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          |  FROM documents),
          |shall AS (
          |  SELECT DISTINCT doc_id,
          |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
          |              || ' ' || w[i+4]
          |            for i in generate_series(1, len(w)-4)]) AS s
          |  FROM tokall),
          |benchsh AS (SELECT DISTINCT s FROM shall WHERE doc_id % 2 = 1),
          |contaminated AS (
          |  SELECT DISTINCT a.doc_id FROM shall a JOIN benchsh USING (s)
          |  WHERE a.doc_id % 2 = 0),
          |clean AS (
          |  SELECT sourced.* FROM sourced
          |  LEFT JOIN contaminated c ON c.doc_id = sourced.doc_id
          |  WHERE c.doc_id IS NULL),
          |annotated AS (
          |  SELECT doc_id,
          |    CASE WHEN en = 0 AND es = 0 AND de = 0 THEN 'unk'
          |         WHEN en >= es AND en >= de THEN 'en'
          |         WHEN es >= de THEN 'es'
          |         ELSE 'de' END AS lang_pred,
          |      least(CAST(ntok AS DOUBLE) / 100.0, 1.0) * 0.5
          |    + (CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok ELSE 0.0 END) * 0.3
          |    + (1.0 - CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars ELSE 0.0 END) * 0.2
          |      AS quality,
          |    CAST(ntok AS BIGINT) AS n_tokens,
          |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          |  FROM (
          |    SELECT doc_id, text,
          |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS en,
          |      len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en|los)\b')) AS es,
          |      len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|von)\b')) AS de,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
          |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
          |      length(text) AS nchars
          |    FROM clean) t),
          |deduped AS (
          |  SELECT doc_id, lang_pred, n_tokens FROM (
          |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          |    FROM annotated
          |    WHERE quality >= 0.5 AND lang_pred != 'unk') d
          |  WHERE rn = 1),
          |packed AS (
          |  SELECT doc_id, lang_pred, n_tokens,
          |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang_pred
          |         ORDER BY doc_id
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |      AS start_off
          |  FROM deduped)
          |SELECT doc_id, lang_pred, n_tokens, start_off,
          |  start_off // 256 AS pack_id,
          |  start_off % 256 AS pack_off
          |FROM packed ORDER BY doc_id""".stripMargin),
      headline = true),

    // ---- per-source document cap (domain balancing) --------------------
    // The per-domain cap a web-crawl curation applies so no source
    // dominates: top-10 per source by integer micro-quality (ties by
    // id). One window partitioned by source — parallel across domains.
    "c6_domain_cap" -> Q(
      (s, dir) => Curation.capPerSource(Lake(s, dir).documents,
          "source", "doc_id", "text", maxDocs = 10)
        .select("doc_id", "source", "q_micro", "rank_in_source")
        .orderBy("doc_id"),
      Some(
        """WITH q AS (
          |  SELECT doc_id, source,
          |    CAST(floor((
          |        least(CAST(ntok AS DOUBLE) / 100.0, 1.0) * 0.5
          |      + (CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok ELSE 0.0 END) * 0.3
          |      + (1.0 - CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars ELSE 0.0 END) * 0.2
          |    ) * 1e6) AS BIGINT) AS q_micro
          |  FROM (
          |    SELECT doc_id, source,
          |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
          |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
          |      length(text) AS nchars
          |    FROM documents) t),
          |r AS (
          |  SELECT doc_id, source, q_micro,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY source
          |         ORDER BY q_micro DESC, doc_id) AS INTEGER) AS rank_in_source
          |  FROM q)
          |SELECT doc_id, source, q_micro, rank_in_source
          |FROM r WHERE rank_in_source <= 10 ORDER BY doc_id""".stripMargin)),

    // ---- mixture rebalancing toward the smallest stratum ---------------
    // Per-language counts -> smallest stratum is the target -> every
    // stratum downsampled to floor(256*min/n) 256ths (floored at 1 so no
    // stratum is ever eliminated outright) with the deterministic md5
    // membership (pure function of doc_id, so the rebalanced mix is
    // reproducible and incremental-load-stable). The threshold table is
    // one tiny broadcast; the corpus never shuffles.
    "c7_mixture_rebalance" -> Q(
      (s, dir) => Curation.rebalanceEqual(
          Lake(s, dir).documents.select("doc_id", "lang"), "lang", "doc_id")
        .select("doc_id", "lang", "kept_256ths")
        .orderBy("doc_id"),
      Some(
        """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
          |m AS (SELECT min(n) AS mn FROM c),
          |sx AS (SELECT lang, greatest(CAST((m.mn * 256) // n AS INTEGER), 1)
          |         AS kept_256ths FROM c, m)
          |SELECT d.doc_id, d.lang, sx.kept_256ths
          |FROM documents d JOIN sx USING (lang)
          |WHERE kept_256ths >= 256
          |   OR (kept_256ths > 0 AND
          |       (strpos('0123456789abcdef',
          |          substr(md5(d.doc_id::VARCHAR), 1, 1)) - 1) * 16
          |     + (strpos('0123456789abcdef',
          |          substr(md5(d.doc_id::VARCHAR), 2, 1)) - 1) < kept_256ths)
          |ORDER BY d.doc_id""".stripMargin)),

    // ---- deterministic epoch shuffle into shards -----------------------
    // Training-order randomization as a sharded writer performs it: a
    // portable 60-bit hash of (seed, doc_id) orders the epoch; shard =
    // hash mod 8, position assigned WITHIN each shard (partitioned
    // window — no global rank anywhere). Same seed = same permutation on
    // any cluster size; the oracle rebuilds the hash digit-for-digit.
    "c8_shard_shuffle" -> Q(
      (s, dir) => Curation.shardShuffle(
          Lake(s, dir).documents.select("doc_id"), "doc_id",
          seed = 7L, numShards = 8)
        .select("doc_id", "shuffle_h", "shard", "shard_pos")
        .orderBy("doc_id"),
      Some(
        """WITH h AS (
          |  SELECT doc_id,
          |    CAST(list_sum([(strpos('0123456789abcdef', substr(m, i, 1)) - 1)
          |                   * CAST(pow(16, 15 - i) AS BIGINT)
          |                   for i in generate_series(1, 15)]) AS BIGINT)
          |      AS shuffle_h
          |  FROM (SELECT doc_id, md5('7:' || doc_id::VARCHAR) AS m FROM documents) t)
          |SELECT doc_id, shuffle_h,
          |  CAST(shuffle_h % 8 AS INTEGER) AS shard,
          |  CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_h % 8
          |       ORDER BY shuffle_h, doc_id) AS BIGINT) AS shard_pos
          |FROM h ORDER BY doc_id""".stripMargin)),

    // ---- sequence-length bucketing for batch assembly ------------------
    // Pad-efficient batching: pow-2 length classes via the binary-digit
    // count (integer-exact where a floating log2 would misclassify exact
    // powers of two), then contiguous 16-doc batches by id within each
    // bucket. Only shuffle is the bucket-partitioned window.
    "c9_length_buckets" -> Q(
      (s, dir) => Curation.lengthBuckets(Lake(s, dir).documents,
          "doc_id", "text", batchSize = 16)
        .orderBy("doc_id"),
      Some(
        """WITH t AS (
          |  SELECT doc_id,
          |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
          |      AS n_tokens
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, n_tokens,
          |    CAST(length(bin(n_tokens)) AS INTEGER) AS bucket
          |  FROM t),
          |r AS (
          |  SELECT doc_id, n_tokens, bucket,
          |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1 AS rn0
          |  FROM b)
          |SELECT doc_id, n_tokens, bucket,
          |  CAST(rn0 // 16 AS BIGINT) AS batch_id,
          |  CAST(rn0 % 16 AS INTEGER) AS batch_pos
          |FROM r ORDER BY doc_id""".stripMargin)),

    // ---- token-budget mixture sampling ---------------------------------
    // "Give me 40k chars with an equal source mix": each source's keep
    // fraction is its equal budget share over its actual volume, clamped
    // to [0,256] 256ths; membership is the deterministic md5 test (c7's
    // machinery), so the sample composes with incremental loads. The
    // threshold table is one tiny broadcast; the corpus never shuffles.
    "c10_token_budget" -> Q(
      (s, dir) => Curation.budgetSample(
          Lake(s, dir).documents.select("doc_id", "source", "n_chars"),
          "source", "doc_id", "n_chars", budgetTokens = 40000L)
        .select("doc_id", "source", "n_chars", "kept_256ths")
        .orderBy("doc_id"),
      Some(
        """WITH per AS (SELECT source, sum(n_chars) AS tok
          |            FROM documents GROUP BY source),
          |ns AS (SELECT count(*) AS ns FROM per),
          |sx AS (SELECT source,
          |         CASE WHEN tok > 0 THEN
          |           least(256, CAST(((40000 // ns.ns) * 256) // tok AS INTEGER))
          |         ELSE 0 END AS kept_256ths
          |       FROM per, ns)
          |SELECT d.doc_id, d.source, d.n_chars, sx.kept_256ths
          |FROM documents d JOIN sx USING (source)
          |WHERE kept_256ths >= 256
          |   OR (kept_256ths > 0 AND
          |       (strpos('0123456789abcdef',
          |          substr(md5(d.doc_id::VARCHAR), 1, 1)) - 1) * 16
          |     + (strpos('0123456789abcdef',
          |          substr(md5(d.doc_id::VARCHAR), 2, 1)) - 1) < kept_256ths)
          |ORDER BY d.doc_id""".stripMargin)),

    // ---- deterministic round-robin source interleave -------------------
    // The mixture schedule: per-source epoch shuffle (seeded portable
    // hash), streams interleaved so reading by sched_pos cycles sources
    // round-robin — no source clumping at shard boundaries. The oracle
    // rebuilds the hash digit-for-digit (c8) and the source index via
    // the strictly-smaller count (no global window on either side).
    "c12_interleave" -> Q(
      (s, dir) => Curation.interleaveSources(
          Lake(s, dir).documents.select("doc_id", "source"),
          "source", "doc_id", seed = 9L)
        .orderBy("doc_id"),
      Some(
        """WITH srcs AS (SELECT DISTINCT source FROM documents),
          |idx AS (SELECT a.source, count(b.source) AS si
          |        FROM srcs a LEFT JOIN srcs b ON b.source < a.source
          |        GROUP BY a.source),
          |ns AS (SELECT count(*) AS n FROM srcs),
          |h AS (
          |  SELECT doc_id, source,
          |    CAST(list_sum([(strpos('0123456789abcdef', substr(m, i, 1)) - 1)
          |                   * CAST(pow(16, 15 - i) AS BIGINT)
          |                   for i in generate_series(1, 15)]) AS BIGINT) AS hv
          |  FROM (SELECT doc_id, source, md5('9:' || doc_id::VARCHAR) AS m
          |        FROM documents) t),
          |p AS (SELECT doc_id, source, hv,
          |        ROW_NUMBER() OVER (PARTITION BY source
          |          ORDER BY hv, doc_id) AS pos
          |      FROM h)
          |SELECT p.doc_id, p.source,
          |  CAST((p.pos - 1) * ns.n + idx.si AS BIGINT) AS sched_pos
          |FROM p JOIN idx USING (source) CROSS JOIN ns
          |ORDER BY p.doc_id""".stripMargin)),

    // ---- DSIR importance weights (hashed importance resampling) --------
    // The published data-selection scorer: per-doc mean log-ratio of
    // target vs raw likelihood over 1024 hashed token buckets, add-one
    // smoothed, target = the English subset. Both distributions come
    // from ONE bounded-width aggregate broadcast back to the occurrence
    // stream; the oracle rebuilds the 60-bit md5 bucket hash
    // digit-for-digit (c8's playbook) and the same smoothing arithmetic,
    // rounded at 4 decimals (libm-ulp noise is ~1e-13, far below the
    // step — t21's argument).
    "c11_dsir_weights" -> Q(
      (s, dir) => Curation.dsirWeights(
          Lake(s, dir).documents.select("doc_id", "lang", "text"),
          isTarget = col("lang") === "en", "doc_id", "text")
        .orderBy("doc_id"),
      Some(
        """WITH occ AS (
          |  SELECT doc_id, is_t,
          |    CAST(list_sum([(strpos('0123456789abcdef', substr(m, i, 1)) - 1)
          |                   * CAST(pow(16, 15 - i) AS BIGINT)
          |                   for i in generate_series(1, 15)]) AS BIGINT) % 1024
          |      AS b
          |  FROM (SELECT doc_id, (lang = 'en') AS is_t,
          |          md5(unnest(string_split_regex(lower(trim(text)), '\s+'))) AS m
          |        FROM documents) t),
          |dist AS (SELECT b, count(*) AS cr,
          |           sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
          |         FROM occ GROUP BY b),
          |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM dist)
          |SELECT occ.doc_id, count(*) AS n_feats,
          |  round(avg(ln((ct + 1.0) / (tt + 1024.0))
          |          - ln((cr + 1.0) / (tr + 1024.0))), 4) + 0.0 AS dsir_w
          |FROM occ JOIN dist USING (b) CROSS JOIN tot
          |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin)),

    // ---- temperature mixture resampling --------------------------------
    // The p_i ∝ n_i^α source-mixing rule at α = 0.5, as a deterministic
    // downsample: stratum keep fraction (n_min/n)^(1−α), thresholds in
    // 4096ths floored at 1, md5 membership. α = 0.5 is the
    // sqrt-expressible point — division, sqrt and ×4096 are all
    // correctly-rounded/exact under IEEE 754, so Spark and DuckDB floor
    // to the SAME integer threshold (pow would not guarantee that).
    "c13_temperature_mix" -> Q(
      (s, dir) => Curation.temperatureMix(
          Lake(s, dir).documents.select("doc_id", "lang"), "lang", "doc_id",
          alpha = 0.5)
        .select("doc_id", "lang", "kept_4096ths")
        .orderBy("doc_id"),
      Some(
        """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
          |m AS (SELECT min(n) AS mn FROM c),
          |sx AS (SELECT lang,
          |         greatest(CAST(floor(sqrt(m.mn::DOUBLE / n) * 4096)
          |                       AS INTEGER), 1) AS kept_4096ths
          |       FROM c, m)
          |SELECT d.doc_id, d.lang, sx.kept_4096ths
          |FROM documents d JOIN sx USING (lang)
          |WHERE kept_4096ths >= 4096
          |   OR (kept_4096ths > 0 AND
          |       (strpos('0123456789abcdef',
          |          substr(md5(d.doc_id::VARCHAR), 1, 1)) - 1) * 256
          |     + (strpos('0123456789abcdef',
          |          substr(md5(d.doc_id::VARCHAR), 2, 1)) - 1) * 16
          |     + (strpos('0123456789abcdef',
          |          substr(md5(d.doc_id::VARCHAR), 3, 1)) - 1) < kept_4096ths)
          |ORDER BY d.doc_id""".stripMargin)),

    // ---- curation drop audit --------------------------------------------
    // "Where did my corpus go?": every input doc labeled with the FIRST
    // c1-pipeline rule that dropped it (low_quality -> unk_lang -> dup
    // -> sampled_out) or 'kept'. The dedup survivor is min id among
    // PASSING rows only (the rows the real dedup stage sees) — min(CASE
    // WHEN passing THEN id END) over the fp window on both engines. The
    // kept set is c1's output by construction (law in OperatorLawsSpec).
    "c14_drop_reasons" -> Q(
      (s, dir) => graft.operators.Curation.dropReasons(
          Lake(s, dir).documents, "doc_id", "text",
          graft.operators.Curation.Config(minQuality = 0.5,
            dropUnknownLang = true, sampleSixteenths = 8))
        .orderBy("doc_id"),
      Some(
        """WITH annotated AS (
          |  SELECT doc_id,
          |    CASE WHEN en = 0 AND es = 0 AND de = 0 THEN 'unk'
          |         WHEN en >= es AND en >= de THEN 'en'
          |         WHEN es >= de THEN 'es'
          |         ELSE 'de' END AS lang_pred,
          |      least(CAST(ntok AS DOUBLE) / 100.0, 1.0) * 0.5
          |    + (CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok ELSE 0.0 END) * 0.3
          |    + (1.0 - CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars ELSE 0.0 END) * 0.2
          |      AS quality,
          |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          |  FROM (
          |    SELECT doc_id, text,
          |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS en,
          |      len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en|los)\b')) AS es,
          |      len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|von)\b')) AS de,
          |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
          |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
          |      length(text) AS nchars
          |    FROM documents) t
          |), windowed AS (
          |  SELECT *, min(CASE WHEN quality >= 0.5 AND lang_pred != 'unk'
          |                     THEN doc_id END)
          |            OVER (PARTITION BY fp) AS min_pass
          |  FROM annotated)
          |SELECT doc_id, lang_pred, quality,
          |  CASE WHEN quality < 0.5 THEN 'low_quality'
          |       WHEN lang_pred = 'unk' THEN 'unk_lang'
          |       WHEN doc_id <> min_pass THEN 'dup'
          |       WHEN md5(fp) >= '8' THEN 'sampled_out'
          |       ELSE 'kept' END AS reason
          |FROM windowed ORDER BY doc_id""".stripMargin)),

    // ---- declarative data-quality expectations (validation gate) -------
    // The pre-training validation suite as ONE tiny report: five
    // row-local checks share a single aggregate scan of lineitem,
    // uniqueness adds one keyed aggregate, referential integrity one
    // broadcast join against the distinct order keys. The fixture is
    // deliberately mixed: the discount bound FAILS (TPC-H discounts run
    // to 0.10) and the famous (l_orderkey, l_linenumber) non-uniqueness
    // of the driver's testdata is pinned as a counted violation, while
    // the true key and the FK pass — so the gate proves both polarities
    // and the exact violation arithmetic against DuckDB.
    "c15_expectations" -> Q(
      (s, dir) => {
        import graft.operators.Expectations
        import graft.operators.Expectations._
        val lk = Lake(s, dir)
        Expectations.validate(lk.lineitem, Seq(
          NotNull("l_orderkey"),
          InRange("l_quantity", lit(1.0), lit(50.0)),
          InRange("l_discount", lit(0.0), lit(0.05)),
          InSet("l_returnflag", Seq("A", "N", "R")),
          MatchesRegex("l_linestatus", "^[FO]$"),
          Unique(Seq("l_orderkey", "l_linenumber")),
          Unique(Seq("l_suppkey", "l_shipdate", "l_orderkey",
            "l_linenumber", "l_quantity")),
          RefersTo("l_orderkey", lk.orders, "o_orderkey")))
      },
      Some(
        """WITH rl AS (
          |  SELECT count(*) AS n_rows,
          |    SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_nn,
          |    SUM(CASE WHEN l_quantity IS NOT NULL
          |             AND NOT (l_quantity BETWEEN 1.0 AND 50.0)
          |             THEN 1 ELSE 0 END) AS v_qty,
          |    SUM(CASE WHEN l_discount IS NOT NULL
          |             AND NOT (l_discount BETWEEN 0.0 AND 0.05)
          |             THEN 1 ELSE 0 END) AS v_disc,
          |    SUM(CASE WHEN l_returnflag IS NOT NULL
          |             AND l_returnflag NOT IN ('A','N','R')
          |             THEN 1 ELSE 0 END) AS v_flag,
          |    SUM(CASE WHEN l_linestatus IS NOT NULL
          |             AND NOT regexp_matches(l_linestatus, '^[FO]$')
          |             THEN 1 ELSE 0 END) AS v_ls
          |  FROM lineitem),
          |u1 AS (
          |  SELECT COALESCE(SUM(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS v,
          |         COALESCE(SUM(n), 0) AS n_rows
          |  FROM (SELECT count(*) AS n FROM lineitem
          |        GROUP BY l_orderkey, l_linenumber)),
          |u2 AS (
          |  SELECT COALESCE(SUM(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS v,
          |         COALESCE(SUM(n), 0) AS n_rows
          |  FROM (SELECT count(*) AS n FROM lineitem
          |        GROUP BY l_suppkey, l_shipdate, l_orderkey,
          |                 l_linenumber, l_quantity)),
          |fk AS (
          |  SELECT SUM(CASE WHEN l.l_orderkey IS NOT NULL
          |                  AND o.o_orderkey IS NULL
          |                  THEN 1 ELSE 0 END) AS v,
          |         count(*) AS n_rows
          |  FROM lineitem l LEFT JOIN
          |    (SELECT DISTINCT o_orderkey FROM orders) o
          |    ON l.l_orderkey = o.o_orderkey)
          |SELECT check_name, CAST(violations AS BIGINT) AS violations,
          |  CAST(n_rows AS BIGINT) AS n_rows, violations = 0 AS passed
          |FROM (
          |  SELECT 'not_null(l_orderkey)' AS check_name, v_nn AS violations,
          |         n_rows FROM rl
          |  UNION ALL SELECT 'in_range(l_quantity)', v_qty, n_rows FROM rl
          |  UNION ALL SELECT 'in_range(l_discount)', v_disc, n_rows FROM rl
          |  UNION ALL SELECT 'in_set(l_returnflag)', v_flag, n_rows FROM rl
          |  UNION ALL SELECT 'matches_regex(l_linestatus)', v_ls, n_rows FROM rl
          |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', v, n_rows FROM u1
          |  UNION ALL SELECT
          |    'unique(l_suppkey,l_shipdate,l_orderkey,l_linenumber,l_quantity)',
          |    v, n_rows FROM u2
          |  UNION ALL SELECT 'refers_to(l_orderkey)', v, n_rows FROM fk)
          |ORDER BY check_name""".stripMargin),
      headline = true),

    // ---- corpus expectations (the LLM-table validation suite) ----------
    // The same engine over the training-data tables: identity and
    // metadata-consistency checks on `documents` (incl. a Satisfies
    // predicate tying n_chars to the actual text length) plus the
    // corpus↔embedding-store referential check. Polarity is exercised
    // BY SCALE: the language whitelist fails everywhere (zh present),
    // and sf0.1's embedding store covers only part of the corpus, so
    // refers_to flips from pass to a counted violation at 10× — the
    // oracle mirrors every count exactly.
    "c16_doc_expectations" -> Q(
      (s, dir) => {
        import graft.operators.Expectations
        import graft.operators.Expectations._
        val lk = Lake(s, dir)
        Expectations.validate(lk.documents, Seq(
          NotNull("doc_id"),
          Unique(Seq("doc_id")),
          InSet("lang", Seq("en", "es", "de", "fr")),
          InRange("n_chars", lit(1L), lit(10000L)),
          Satisfies("n_chars_matches_text",
            length(col("text")) === col("n_chars")),
          RefersTo("doc_id", lk.embeddings, "vec_id")))
      },
      Some(
        """WITH rl AS (
          |  SELECT count(*) AS n_rows,
          |    SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS v_nn,
          |    SUM(CASE WHEN lang IS NOT NULL
          |             AND lang NOT IN ('en','es','de','fr')
          |             THEN 1 ELSE 0 END) AS v_lang,
          |    SUM(CASE WHEN n_chars IS NOT NULL
          |             AND NOT (n_chars BETWEEN 1 AND 10000)
          |             THEN 1 ELSE 0 END) AS v_len,
          |    SUM(CASE WHEN length(text) = n_chars THEN 0 ELSE 1 END) AS v_sat
          |  FROM documents),
          |u AS (
          |  SELECT COALESCE(SUM(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS v,
          |         COALESCE(SUM(n), 0) AS n_rows
          |  FROM (SELECT count(*) AS n FROM documents GROUP BY doc_id)),
          |fk AS (
          |  SELECT SUM(CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NULL
          |                  THEN 1 ELSE 0 END) AS v,
          |         count(*) AS n_rows
          |  FROM documents d LEFT JOIN
          |    (SELECT DISTINCT vec_id FROM embeddings) e
          |    ON d.doc_id = e.vec_id)
          |SELECT check_name, CAST(violations AS BIGINT) AS violations,
          |  CAST(n_rows AS BIGINT) AS n_rows, violations = 0 AS passed
          |FROM (
          |  SELECT 'in_range(n_chars)' AS check_name, v_len AS violations,
          |         n_rows FROM rl
          |  UNION ALL SELECT 'in_set(lang)', v_lang, n_rows FROM rl
          |  UNION ALL SELECT 'not_null(doc_id)', v_nn, n_rows FROM rl
          |  UNION ALL SELECT 'refers_to(doc_id)', v, n_rows FROM fk
          |  UNION ALL SELECT 'satisfies(n_chars_matches_text)', v_sat,
          |         n_rows FROM rl
          |  UNION ALL SELECT 'unique(doc_id)', v, n_rows FROM u)
          |ORDER BY check_name""".stripMargin)),

    // ---- learned quality classifier (fastText/CCNet-style) -------------
    // Distant supervision: the trusted metadata language tag is the weak
    // label, three engine-portable surface features (length saturation,
    // en-stopword share, symbol share — t2's proven-parity components)
    // are the inputs, and 4 rounds of full-batch gradient descent with a
    // rational sigmoid link learn the filter. The oracle replays the
    // ENTIRE training trajectory (every gradient cell is rounded to the
    // 1e-6 grid before the update, the Clustering/BPE replay playbook),
    // so the per-doc scores hash-pin the fit itself, not just the
    // scoring pass. Scale: each round is one dim+1-cell map-side
    // aggregate, driver holds O(dim); scoring is a literal expression.
    "c17_quality_classifier" -> Q(
      (s, dir) => {
        import graft.operators.Classifier
        import graft.functions.TextFunctions
        val text = col("text")
        val nTok = size(TextFunctions.tokens(text)).cast(DoubleType)
        val stopHits = TextFunctions
          .langScore(text, TextFunctions.langMarkers.head._2)
          .cast(DoubleType)
        val punct = regexp_count(text, lit("""[^\s\p{L}\p{N}]"""))
          .cast(DoubleType)
        val feats = Lake(s, dir).documents.select(
          col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
          least(nTok / 100.0, lit(1.0)).as("x1"),
          when(nTok > 0, stopHits / nTok).otherwise(lit(0.0)).as("x2"),
          when(length(text) > 0, punct / length(text).cast(DoubleType))
            .otherwise(lit(0.0)).as("x3"))
        val model = Classifier.fit(feats, "y", Seq("x1", "x2", "x3"),
          iters = 4, lr = 4.0)
        feats.select(col("doc_id"),
            Classifier.scoreCol(model,
              Seq(col("x1"), col("x2"), col("x3"))).as("score"))
          .withColumn("pred", col("score") >= 0.5)
          .orderBy("doc_id")
      },
      Some(classifierOracleSql(iters = 4, lr = "4.0"))),

    // ---- held-out evaluation of the learned classifier -----------------
    // c17 hash-gates the training TRAJECTORY (determinism); this gates
    // its USEFULNESS: a deterministic md5 split (Sampling.hashKeep 12/16
    // = 75% train), fit on the train half only, then per-source
    // Mann-Whitney AUC of the held-out scores vs the weak label via the
    // t38 tied-rank device, with an explicit floor (auc_ok = auc >= 0.9)
    // in the hash-gated output. The weak label is metadata-only
    // (n_chars >= 300 — a byte-length flag the ingest layer knows
    // without reading the text), recovered from surface features; the
    // zero-iteration model scores every doc 0.5 (AUC exactly 0.5), so
    // the gate proves TRAINING moved held-out ranking quality from coin-
    // flip to >= 0.9, not that the pipeline merely runs. Monotonicity
    // (more rounds never degrade held-out AUC on this fixture) is
    // law-pinned in ClassifierSpec.
    "c18_classifier_eval" -> Q(
      (s, dir) => {
        import graft.operators.{Classifier, Sampling}
        import graft.functions.TextFunctions
        val text = col("text")
        val nTok = size(TextFunctions.tokens(text)).cast(DoubleType)
        val stopHits = TextFunctions
          .langScore(text, TextFunctions.langMarkers.head._2)
          .cast(DoubleType)
        val punct = regexp_count(text, lit("""[^\s\p{L}\p{N}]"""))
          .cast(DoubleType)
        val feats = Lake(s, dir).documents.select(
          col("source"),
          when(col("n_chars") >= 300, 1.0).otherwise(0.0).as("y"),
          least(nTok / 100.0, lit(1.0)).as("x1"),
          when(nTok > 0, stopHits / nTok).otherwise(lit(0.0)).as("x2"),
          when(length(text) > 0, punct / length(text).cast(DoubleType))
            .otherwise(lit(0.0)).as("x3"),
          Sampling.hashKeep(col("doc_id"), 12).as("__train"))
        val model = Classifier.fit(feats.where(col("__train")),
          "y", Seq("x1", "x2", "x3"), iters = 4, lr = 4.0)
        val test = feats.where(!col("__train")).select(
          col("source"), col("y"),
          Classifier.scoreCol(model,
            Seq(col("x1"), col("x2"), col("x3"))).as("score"))
        val rk = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("score"))
        val ties = org.apache.spark.sql.expressions.Window
          .partitionBy("source", "score")
        test
          .withColumn("r",
            rank().over(rk) + (count(lit(1)).over(ties) - 1) / lit(2.0))
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("np"),
            sum(when(col("y") === 1.0, col("r"))).as("srp"))
          .select(col("source"),
            col("n").as("n_test"),
            col("np").cast(org.apache.spark.sql.types.LongType).as("n_pos"),
            (round(
              when(col("np") > 0 && col("np") < col("n"),
                (col("srp") - col("np") * (col("np") + 1) / 2) /
                  (col("np") * (col("n") - col("np")))),
              4) + lit(0.0)).as("auc"))
          .withColumn("auc_ok", col("auc") >= 0.9)
          .orderBy("source")
      },
      Some(classifierEvalOracleSql(iters = 4, lr = "4.0"))),
  )

  /** DuckDB replay of [[graft.operators.Classifier.fit]] + score over the
    * documents table: features once, then per round r a margin/link pass
    * (`z{r}`), the rounded gradient cells (`g{r}`), and the rounded
    * weight update (`w{r}`) — each weight CTE MATERIALIZED because it is
    * referenced by both the next round's margin and its update (DuckDB
    * inlines CTEs; a twice-referenced round state re-expands 2^rounds).
    * Arithmetic is written in the exact op order the Spark side uses:
    * left-assoc margin, `0.5 + (0.5 * z) / (1.0 + abs(z))` link. */
  private def classifierOracleSql(iters: Int, lr: String): String = {
    val sb = new StringBuilder
    sb ++=
      """WITH f AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |    least(CAST(ntok AS DOUBLE) / 100.0, 1.0) AS x1,
        |    CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok
        |         ELSE 0.0 END AS x2,
        |    CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars
        |         ELSE 0.0 END AS x3
        |  FROM (
        |    SELECT doc_id, lang,
        |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
        |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
        |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
        |      length(text) AS nchars
        |    FROM documents) t),
        |w0 AS (SELECT 0.0::DOUBLE AS b, 0.0::DOUBLE AS w1,
        |              0.0::DOUBLE AS w2, 0.0::DOUBLE AS w3)""".stripMargin
    sb ++= classifierRoundCtes(iters, lr, src = "f")
    sb ++=
      s"""
         |SELECT doc_id, score, score >= 0.5 AS pred
         |FROM (
         |  SELECT t.doc_id,
         |    round(0.5 + (0.5 * t.z) / (1.0 + abs(t.z)), 6) AS score
         |  FROM (SELECT f.doc_id,
         |          w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
         |        FROM f, w$iters w) t)
         |ORDER BY doc_id""".stripMargin
    sb.result()
  }

  /** The per-round GD replay CTEs (`z{r}` margin/link pass, `g{r}` rounded
    * gradient cells, `w{r}` rounded weight update) over the source CTE
    * `src`. Each weight CTE is MATERIALIZED: it is referenced by both the
    * next round's margin and its own update, and DuckDB inlines CTEs —
    * a twice-referenced round state re-expands 2^rounds. */
  private def classifierRoundCtes(iters: Int, lr: String, src: String): String = {
    val sb = new StringBuilder
    for (r <- 1 to iters) {
      sb ++=
        s""",
           |z$r AS (
           |  SELECT t.y, t.x1, t.x2, t.x3,
           |    0.5 + (0.5 * t.z) / (1.0 + abs(t.z)) AS p
           |  FROM (SELECT f.y, f.x1, f.x2, f.x3,
           |          w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
           |        FROM $src f, w${r - 1} w) t),
           |g$r AS (
           |  SELECT round(avg(p - y), 6) AS g0,
           |    round(avg((p - y) * x1), 6) AS g1,
           |    round(avg((p - y) * x2), 6) AS g2,
           |    round(avg((p - y) * x3), 6) AS g3
           |  FROM z$r),
           |w$r AS MATERIALIZED (
           |  SELECT round(w.b - $lr * g.g0, 6) AS b,
           |    round(w.w1 - $lr * g.g1, 6) AS w1,
           |    round(w.w2 - $lr * g.g2, 6) AS w2,
           |    round(w.w3 - $lr * g.g3, 6) AS w3
           |  FROM w${r - 1} w, g$r g)""".stripMargin
    }
    sb.result()
  }

  /** DuckDB replay of the c18 train/eval split: the c17 feature CTE plus
    * the md5 hash-split flag, training rounds over the TRAIN half only,
    * then per-source tied-rank Mann-Whitney AUC (the t38 device) of the
    * held-out scores against the weak label, with the explicit 0.9 floor
    * in the output. Weak label = n_chars >= 300 (metadata-only). */
  private def classifierEvalOracleSql(iters: Int, lr: String): String = {
    val sb = new StringBuilder
    sb ++=
      """WITH f AS MATERIALIZED (
        |  SELECT doc_id, source,
        |    CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y,
        |    least(CAST(ntok AS DOUBLE) / 100.0, 1.0) AS x1,
        |    CASE WHEN ntok > 0 THEN CAST(stop_hits AS DOUBLE) / ntok
        |         ELSE 0.0 END AS x2,
        |    CASE WHEN nchars > 0 THEN CAST(punct AS DOUBLE) / nchars
        |         ELSE 0.0 END AS x3,
        |    md5(CAST(doc_id AS VARCHAR)) < 'c' AS train
        |  FROM (
        |    SELECT doc_id, source, n_chars,
        |      len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
        |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS stop_hits,
        |      len(regexp_extract_all(text, '[^\s\p{L}\p{N}]')) AS punct,
        |      length(text) AS nchars
        |    FROM documents) t),
        |tr AS (SELECT * FROM f WHERE train),
        |w0 AS (SELECT 0.0::DOUBLE AS b, 0.0::DOUBLE AS w1,
        |              0.0::DOUBLE AS w2, 0.0::DOUBLE AS w3)""".stripMargin
    sb ++= classifierRoundCtes(iters, lr, src = "tr")
    sb ++=
      s""",
         |s AS (
         |  SELECT t.source, t.y,
         |    round(0.5 + (0.5 * t.z) / (1.0 + abs(t.z)), 6) AS score
         |  FROM (SELECT f.source, f.y,
         |          w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
         |        FROM f, w$iters w WHERE NOT f.train) t),
         |r AS (
         |  SELECT source, y,
         |    rank() OVER (PARTITION BY source ORDER BY score)
         |      + (count(*) OVER (PARTITION BY source, score) - 1) / 2.0 AS r
         |  FROM s),
         |a AS (
         |  SELECT source, count(*) AS n, sum(y) AS np,
         |    sum(CASE WHEN y = 1.0 THEN r END) AS srp
         |  FROM r GROUP BY source)
         |SELECT source, CAST(n AS BIGINT) AS n_test,
         |  CAST(np AS BIGINT) AS n_pos,
         |  round(CASE WHEN np > 0 AND np < n
         |    THEN (srp - np * (np + 1) / 2) / (np * (n - np)) END, 4) + 0.0
         |    AS auc,
         |  (round(CASE WHEN np > 0 AND np < n
         |    THEN (srp - np * (np + 1) / 2) / (np * (n - np)) END, 4) + 0.0)
         |    >= 0.9 AS auc_ok
         |FROM a ORDER BY source""".stripMargin
    sb.result()
  }
}
