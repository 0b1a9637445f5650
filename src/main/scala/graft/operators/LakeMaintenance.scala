package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lake write/maintenance patterns beyond the reference's full-overwrite.
  *
  * The reference rewrites every table wholesale on each run
  * (`mode("overwrite")` at `etl.py:46,62,95,134,171`) — at 100 TB a daily
  * refresh cannot rewrite history. These helpers cover the two standard
  * remedies for partitioned Parquet lakes:
  *
  *  - [[overwritePartitions]]: dynamic partition overwrite — only the
  *    partitions present in the incoming batch are replaced; untouched
  *    history survives. (The idempotent incremental-load primitive.)
  *  - [[compact]]: small-file compaction — streaming/incremental writers
  *    accumulate files far below the Parquet sweet spot; reading N tiny
  *    files costs N opens + N footer parses and starves the scan of
  *    row-group parallelism. Rewrites a table directory to
  *    ~`targetFileBytes` files per partition.
  */
object LakeMaintenance {

  /** MERGE-INTO (latest-wins upsert) as a pure DataFrame transform — the
    * engine's analog of `MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED
    * THEN INSERT` for snapshot maintenance on a plain-Parquet lake:
    * every key keeps exactly one row; an update row replaces the base
    * row for its key unconditionally, and within each side the latest by
    * `versionCols` (descending, e.g. an event time then a unique id for
    * totality) wins. One window shuffle partitioned by the merge key —
    * fully parallel across keys, no global ordering; pair with
    * [[overwritePartitions]] to land the merged snapshot incrementally.
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame,
                  keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty && versionCols.nonEmpty)
    val tagged = base.withColumn("__origin", lit(0))
      .unionByName(updates.withColumn("__origin", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(desc("__origin") +: versionCols.map(c => desc(c)): _*)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__origin", "__rn")
  }

  /** Latest-VERSION-wins merge (the CDC resolution rule): one row per
    * key across base ∪ updates, ordered by `versionCols` descending with
    * update-beats-base only as the final tiebreak. Unlike [[mergeUpsert]]
    * (whose update side wins unconditionally — interactive MERGE
    * semantics), the outcome is ARRIVAL-ORDER-INVARIANT: applying update
    * batches in any interleaving converges to the same snapshot, which
    * is what a continuous CDC ingest needs. The invariance REQUIRES
    * `versionCols` to be a total order per key (end with a unique
    * column, e.g. an event id): if two rows of one key tie on every
    * version column, the origin tiebreak picks whichever arrived in the
    * later batch — order-dependent by construction. Same one-window
    * shape. */
  def mergeLatest(base: DataFrame, updates: DataFrame,
                  keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty && versionCols.nonEmpty)
    val tagged = base.withColumn("__origin", lit(0))
      .unionByName(updates.withColumn("__origin", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(c => desc(c)) :+ desc("__origin"): _*)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__origin", "__rn")
  }

  /** Stable key-hash bucket for snapshot partitioning. */
  private def bucketOf(keyCols: Seq[String], numBuckets: Int) = {
    import org.apache.spark.sql.functions._
    pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets.toLong)).cast("int")
  }

  /** One incremental MERGE step against a key-bucketed Parquet snapshot:
    * reads ONLY the buckets the batch touches, resolves latest-version-
    * wins ([[mergeLatest]]), and lands the merged buckets via dynamic
    * partition overwrite. Per-batch cost is proportional to the touched
    * buckets, never the whole snapshot; the touched-bucket list is a
    * driver-side collect bounded by `numBuckets` (a config, the same
    * size class as a partition count — size it with the snapshot).
    * The merged frame is localCheckpoint-ed before the write because a
    * path cannot be overwritten while a plan still reads it; a durable
    * deployment stages to a scratch dir + rename instead (same caveat
    * as Dedup.truncate). Replaying a batch is a no-op by construction
    * (merge of already-applied rows resolves to the identical rows). */
  def upsertIntoSnapshot(batch: DataFrame, path: String,
                         keyCols: Seq[String], versionCols: Seq[String],
                         numBuckets: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = batch.sparkSession
    // persist: the batch feeds both the touched-bucket collect and the
    // merge — without it any upstream transformation runs twice per
    // micro-batch, and a non-replayable source could even hand the two
    // evaluations different rows (touched inconsistent with the data)
    val bucketed = batch.withColumn("__bucket", bucketOf(keyCols, numBuckets))
      .persist()
    try {
      val touched = bucketed.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSeq
      // existence probe through the Hadoop FS API (session conf, like
      // compact(): runtime spark.conf fs settings apply) so the snapshot
      // can live on any supported store, not only the local disk. A dir
      // that exists but holds no data entries (pre-created empty sink)
      // counts as absent — reading it would fail schema inference. Data
      // entries are partition dirs (`__bucket=N` — underscore-leading
      // because the column is, so a bare hidden-prefix test would wrongly
      // reject the whole snapshot) or non-hidden files; `_SUCCESS`,
      // `_temporary`, `.crc` are not. One root listing, bounded by
      // numBuckets.
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
      val exists = fs.exists(hPath) && fs.listStatus(hPath).exists { st =>
        val n = st.getPath.getName
        n.contains("=") || !(n.startsWith("_") || n.startsWith("."))
      }
      val existing =
        if (exists)
          spark.read.parquet(path).where(col("__bucket").isin(touched: _*))
            .select(bucketed.columns.toIndexedSeq.map(col): _*) // partition col position
        else bucketed.limit(0)
      val merged = LakeMaintenance
        .mergeLatest(existing, bucketed, keyCols, versionCols)
        .localCheckpoint(eager = true)
      overwritePartitions(merged, path, Seq("__bucket"))
    } finally bucketed.unpersist(blocking = false)
  }

  /** Overwrite only the partitions present in `df` under `path`. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Rewrite `inDir` into `outDir` with close-to-target file sizes.
    * Output file count is estimated from the input bytes; partitioned
    * layouts keep their partition columns via `partitionCols`. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              partitionCols: Seq[String] = Nil,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val inputBytes = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sessionState.newHadoopConf())
      fs.getContentSummary(new org.apache.hadoop.fs.Path(inDir)).getLength
    }
    val files = math.max(1, math.ceil(inputBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val writer =
      (if (partitionCols.isEmpty) df.coalesce(files)
       else df.repartition(files, partitionCols.map(df.col): _*))
        .write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
      .parquet(outDir)
  }

  /** In-place small-file compaction for a partitioned snapshot (the
    * [[upsertIntoSnapshot]] layout): every micro-batch's dynamic
    * partition overwrite leaves one file per (touched bucket × write
    * task), so a long-running stream accretes small files even though
    * the DATA stays merged. This rewrites the whole snapshot hashed on
    * its partition columns — each partition value lands in exactly one
    * task, so each directory collapses to one file (a few, when the
    * byte-size estimate asks for more tasks than partition values) —
    * and republishes via the same dynamic overwrite. localCheckpoint
    * materializes the read before the overwrite (a path cannot be
    * rewritten while a plan still reads it). Semantically a no-op:
    * byte layout changes, rows do not. */
  def compactSnapshotInPlace(spark: SparkSession, path: String,
                             partitionCols: Seq[String],
                             targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(partitionCols.nonEmpty, "compactSnapshotInPlace needs partition columns")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, hPath)
    if (!fs.exists(hPath)) return
    val inputBytes = fs.getContentSummary(hPath).getLength
    val files = math.max(1, math.ceil(inputBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val merged = df.repartition(files, partitionCols.map(df.col): _*)
      .localCheckpoint(eager = true)
    overwritePartitions(merged, path, partitionCols)
  }

  /** Manifest file whose PRESENCE is a version's commit marker (see
    * [[writeSnapshotVersion]]). The leading underscore keeps Spark's
    * parquet reader from treating it as data. */
  private val ManifestName = "_graft_manifest.json"

  private def fsOf(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sessionState.newHadoopConf())

  /** Every `v=<n>` directory under `root`, committed or not, ascending.
    * Version ALLOCATION must look at all of them — a crashed writer's
    * partial directory still occupies its number and must never be
    * written over. */
  private def allVersionDirs(spark: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toLong }
      .sorted
  }

  /** COMMITTED versions under a versioned-snapshot root, ascending: a
    * `v=<n>` directory counts only once its manifest exists — a data
    * directory mid-write (or abandoned by a crashed writer) is invisible
    * here and to every reader. Metadata-only: one directory listing plus
    * one existence probe per version. */
  def snapshotVersions(spark: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, p)
    allVersionDirs(spark, root).filter { v =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$root/v=$v/$ManifestName"))
    }
  }

  /** TIME-TRAVEL writes with an ATOMIC COMMIT: land `df` as the next
    * immutable version under `root` (`root/v=<n>` — the Delta/Iceberg
    * snapshot idea with plain-Parquet machinery).
    *
    * Commit protocol (the round-6 torn-directory hole closed; the
    * round-10 allocation race closed with OPTIMISTIC CONCURRENCY):
    *  1. allocate n = max over ALL `v=` directories + 1 — committed or
    *     torn — so a partial directory is never written over;
    *  2. CLAIM the version by atomically creating `v=<n>/_claim`
    *     (create-fail-if-exists — the one primitive that serializes
    *     writers): exactly one contender owns each version number; a
    *     loser re-reads the directory listing and retries on the next
    *     number, so concurrent writers land on DISTINCT consecutive
    *     versions and none is lost or mixed;
    *  3. write the data files into the claimed `v=<n>`; the directory
    *     is INVISIBLE to [[snapshotVersions]]/[[readSnapshotVersion]]
    *     because it has no manifest yet — a crash here leaves garbage
    *     (a permanently-claimed torn dir vacuum clears), never a
    *     readable-but-torn version;
    *  4. list the files actually written and stage a manifest (name →
    *     byte length) as a hidden temp file inside the directory;
    *  5. PUBLISH with a single rename of the temp to `_graft_manifest
    *     .json` — the one atomic step (rename atomicity is the same
    *     primitive every file-listing-based table format leans on;
    *     object stores without atomic rename or atomic create need
    *     their usual metastore/log shim).
    * Readers validate the manifest against the files on disk
    * ([[readSnapshotVersion]]) and scan exactly the manifested files, so
    * a reader can never serve a half-written version. Old versions are
    * never rewritten; [[vacuumVersions]] retires superseded ones.
    * Returns the version written. */
  def writeSnapshotVersion(df: DataFrame, root: String,
                           maxAttempts: Int = 20): Long = {
    require(maxAttempts >= 1)
    val spark = df.sparkSession
    val fs = fsOf(spark, new org.apache.hadoop.fs.Path(root))
    var attempt = 0
    while (true) {
      attempt += 1
      val next = allVersionDirs(spark, root).lastOption.getOrElse(0L) + 1
      val dirPath = new org.apache.hadoop.fs.Path(s"$root/v=$next")
      fs.mkdirs(dirPath)
      val claimed =
        try { fs.create(new org.apache.hadoop.fs.Path(dirPath, "_claim"), false).close(); true }
        catch { case _: java.io.IOException => false }
      if (claimed) {
        // append mode: the dir exists (it holds the claim marker) but
        // the claim guarantees this writer is its only owner
        df.write.mode(SaveMode.Append).parquet(dirPath.toString)
        val files = fs.listStatus(dirPath).toSeq
          .filter(f => f.isFile && isDataFile(f.getPath.getName))
          .sortBy(_.getPath.getName)
        val manifest = files
          .map(f => "\"" + f.getPath.getName + "\":" + f.getLen)
          .mkString(s"""{"version":$next,"files":{""", ",", "}}")
        val tmp = new org.apache.hadoop.fs.Path(dirPath, s".$ManifestName.tmp")
        val out = fs.create(tmp, true)
        try out.write(manifest.getBytes("UTF-8")) finally out.close()
        val target = new org.apache.hadoop.fs.Path(dirPath, ManifestName)
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(
            s"snapshot commit of v=$next lost the publish rename: $target")
        return next
      }
      if (attempt >= maxAttempts)
        throw new java.io.IOException(
          s"could not claim a snapshot version under $root after $maxAttempts attempts")
      // lost the claim race: the winner's directory is now visible to
      // allocation, so the retry lands on the next number
    }
    -1L // unreachable
  }

  /** Spark data files only — success markers, CRCs and staged manifests
    * are not part of a version's content. */
  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Parse a version's manifest into (file name → byte length). */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path): Map[String, Long] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, ManifestName))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(text) \ "files" match {
      case JObject(fields) => fields.collect {
        case (k, JInt(v))    => k -> v.toLong
        case (k, JDouble(v)) => k -> v.toLong
      }.toMap
      case other => throw new java.io.IOException(
        s"malformed snapshot manifest under $dir: $other")
    }
  }

  /** Read a pinned snapshot version, or the latest when `version` is
    * negative. Only COMMITTED versions are servable; the manifest is
    * validated against the directory first (every manifested file
    * present with its recorded length) and the scan reads EXACTLY the
    * manifested files — stray files from a failed concurrent writer are
    * ignored rather than served. Throws on an empty root, a missing
    * version, or a manifest/files mismatch. */
  def readSnapshotVersion(spark: SparkSession, root: String,
                          version: Long = -1L): DataFrame = {
    val versions = snapshotVersions(spark, root)
    require(versions.nonEmpty, s"no committed snapshot versions under $root")
    val v = if (version < 0) versions.last else version
    require(versions.contains(v), s"version $v not in $versions")
    val dir = new org.apache.hadoop.fs.Path(s"$root/v=$v")
    val fs = fsOf(spark, dir)
    val manifest = readManifest(fs, dir)
    val onDisk = fs.listStatus(dir).toSeq
      .filter(f => f.isFile && isDataFile(f.getPath.getName))
      .map(f => f.getPath.getName -> f.getLen).toMap
    val broken = manifest.collect {
      case (name, len) if !onDisk.get(name).contains(len) =>
        s"$name (manifest $len bytes, on disk ${onDisk.get(name).fold("missing")(_.toString)})"
    }
    if (broken.nonEmpty)
      throw new java.io.IOException(
        s"snapshot v=$v under $root failed manifest validation: ${broken.mkString(", ")}")
    spark.read.parquet(manifest.keys.toSeq.sorted.map(n => s"$root/v=$v/$n"): _*)
  }

  /** Retention for versioned snapshots: keep the newest `keepLast`
    * COMMITTED versions, delete every older committed one, and (when
    * `includeAborted`) clear torn directories — `v=` dirs without a
    * manifest whose number is below the newest committed version, which
    * can only be crashed-writer leftovers because allocation is monotone
    * over all existing directories. A torn dir ABOVE the newest commit
    * is left alone: it may be a writer mid-flight. Returns the versions
    * deleted, ascending. */
  def vacuumVersions(spark: SparkSession, root: String, keepLast: Int,
                     includeAborted: Boolean = true): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val committed = snapshotVersions(spark, root)
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, p)
    val expired = committed.dropRight(keepLast)
    val aborted =
      if (includeAborted && committed.nonEmpty)
        allVersionDirs(spark, root)
          .filter(v => v < committed.last && !committed.contains(v))
      else Seq.empty
    val doomed = (expired ++ aborted).distinct.sorted
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v=$v"), true)
    }
    doomed
  }

  /** Compaction PLAN over a file manifest: assigns each file to an output
    * bin by the running-sum rule (bin = exclusive-prefix-bytes DIV
    * target), the streaming bin-packing every table-maintenance service
    * uses — deterministic, order-preserving within a partition, every bin
    * except a partition's last holds >= targetBytes. This is the
    * metadata-side complement of [[compact]] (which rewrites data): it
    * runs over the file MANIFEST — thousands of rows per table partition,
    * not data — so the per-partition ordered window is bounded by
    * manifest size, never corpus size. Returns the manifest with a `bin`
    * column; aggregate by (partition, bin) for the rewrite task list. */
  def compactionBins(manifest: DataFrame, partCol: String, orderCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(targetBytes > 0)
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .withColumn("__cum", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum DIV ${targetBytes}L"))
      .drop("__cum")
  }

  /** Range-cluster a table on `clusterCol`: repartitionByRange gives each
    * output file a DISJOINT value range, and the within-partition sort
    * tightens every row group's min/max stats inside it. Point/range
    * filters on the clustered column then skip whole files' row groups at
    * scan time via Parquet predicate pushdown — the write-side half of
    * data-skipping, and at 100 TB the difference between a filtered scan
    * reading one file or all of them. */
  def clusterBy(df: DataFrame, outDir: String, clusterCol: String,
                files: Int): Unit =
    df.repartitionByRange(files, df.col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite)
      .parquet(outDir)

  /** Z-order clustering on MULTIPLE columns: each column is normalized to
    * a fixed-width bucket rank (uniform buckets between its min and max —
    * two driver scalars, no sort) and the bucket bits are interleaved
    * into one z-value; range-partitioning + sorting on the z-value places
    * rows that are close in ANY clustered dimension into the same files,
    * so point/range filters on EVERY clustered column skip row groups —
    * where [[clusterBy]] (linear order) only ever skips on its leading
    * column. The multi-dimensional half of write-side data skipping
    * (Delta/Iceberg OPTIMIZE ZORDER does the same thing).
    *
    * The z-value is computed as a pure column expression (shifts + ors
    * over the bucket bits) — one narrow map, then the same
    * repartitionByRange + write as the linear form. */
  def zOrderBy(df: DataFrame, outDir: String, clusterCols: Seq[String],
               files: Int): Unit = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    require(clusterCols.size >= 2, "use clusterBy for a single column")
    val bits = math.min(12, 30 / clusterCols.size) // z-value stays < 2^31
    val buckets = 1 << bits
    // per-column min/max: one tiny aggregate, two driver scalars each
    val aggs = clusterCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    def bucketOf(c: String, i: Int): Column = {
      // an all-NULL column has null min/max: degenerate to bucket 0
      val lo = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val hi = if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)
      if (hi <= lo) lit(0)
      else least(lit(buckets - 1), greatest(lit(0),
        floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * buckets)
          .cast("int")))
    }
    val z = (0 until bits).foldLeft(lit(0)) { (acc, b) =>
      clusterCols.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a.bitwiseOR(
          shiftleft(shiftright(bucketOf(c, i), b).bitwiseAND(lit(1)),
            b * clusterCols.size + i))
      }
    }
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .parquet(outDir)
  }

  /** Order-independent dataset content fingerprint — the reproducibility
    * check two pipeline runs (or two replicas of a lake) compare without
    * sorting or shipping data: each row hashes to a 48-bit value (md5
    * over the canonical `|`-joined hash columns, so the fingerprint is
    * engine-portable — cf. t5's per-doc rolling hash, which is
    * order-SENSITIVE by design), and a group's fingerprint is the SUM of
    * its row hashes mod 2^60. Addition is commutative/associative, so
    * the result is independent of partitioning, read order and merge
    * schedule — same reasoning as [[Sketches]], but exact. The sum runs
    * in DECIMAL(38,0): overflow-proof to ~10^20 rows without wraparound
    * semantics that ANSI mode would reject. Detects any content change
    * except a pathological constructed collision (sum cancellation);
    * pair with `n_rows` to also catch duplication-with-removal.
    * One partial-aggregated groupBy; no shuffle beyond the group keys. */
  def datasetFingerprint(df: DataFrame, groupCols: Seq[String],
                         hashCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(hashCols.nonEmpty, "datasetFingerprint needs hash columns")
    val rowHash = conv(
      substring(md5(concat_ws("|", hashCols.map(col(_).cast("string")): _*)
        .cast("binary")), 1, 12), 16, 10)
      .cast("decimal(38,0)")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(rowHash), lit(1152921504606846976L).cast("decimal(38,0)"))
          .cast("long").as("fingerprint"))
  }
}
