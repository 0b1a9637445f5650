package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.functions.VectorFunctions.{cosine, cosineHof}

/** Persisted IVF index: the build-once / probe-many split a production
  * ANN service runs, separated from [[Similarity.ivfTopK]]'s inline
  * train-and-query (which re-trains per call — right for one-shot
  * analytics, wrong for a 100 TB corpus serving many query batches).
  *
  * Layout under `dir` — GENERATIONAL, with an atomic commit marker (the
  * snapshot family's `_manifest` protocol, applied to the index):
  *   - `cells/g=<n>/bucket=<b>/…parquet` — cell data files; a build
  *     writes a full generation, an append writes ONLY its delta files
  *     under a fresh `g=` dir (existing files are never rewritten)
  *   - `centroids/g=<n>/` — the centroid table each generation serves
  *     (at most 2^planes rows)
  *   - `_manifests/m=<n>.json` — generation n's commit marker: planes /
  *     trained flag, its centroid dir, and the EXACT cell-file list
  *     (path → byte length) that constitutes the generation.
  *
  * A generation exists only once its manifest does, and the manifest
  * lands via write-temp + one atomic rename — so a writer dying at ANY
  * earlier point (partial delta files, refreshed centroids, staged
  * manifest) leaves the previous generation byte-identically servable:
  * readers resolve the newest committed manifest and scan exactly its
  * manifested files, never whatever else the directory holds. A RETRIED
  * append allocates a fresh `g=` dir, so the crashed attempt's orphan
  * files are never referenced (no duplicate rows — the batch-guard
  * convention SnapshotStream follows); [[vacuum]] reclaims them.
  *
  * The bucket partitioning is the scale design: `query` joins the cell
  * scan on `bucket` against a broadcast probe list, so Spark's dynamic
  * partition pruning reads ONLY the probed buckets' files — querying
  * touches nProbe/2^planes of the corpus bytes, not all of them.
  * (VectorIndexSpec pins the pruning in the plan.) Re-probing with
  * different nProbe/k re-reads the index, never re-trains it.
  */
object VectorIndex {

  private val ManifestDir = "_manifests"

  private def fsOf(spark: SparkSession, path: Path): FileSystem =
    path.getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed generations under `dir`, ascending: one per manifest. */
  def generations(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(s"$dir/$ManifestDir")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("m=") && s.endsWith(".json") =>
        s.stripPrefix("m=").stripSuffix(".json").toLong }
      .sorted
  }

  /** Every generation NUMBER in use, committed or torn — allocation must
    * never write over a crashed writer's partial `g=` directory. */
  private def allGenNumbers(spark: SparkSession, dir: String): Seq[Long] = {
    def gDirs(sub: String): Seq[Long] = {
      val p = new Path(s"$dir/$sub")
      val fs = fsOf(spark, p)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
        .collect { case s if s.startsWith("g=") => s.drop(2).toLong }
    }
    (generations(spark, dir) ++ gDirs("cells") ++ gDirs("centroids")).distinct.sorted
  }

  /** One exchange keyed on (bucket, id-hash mod n) so the partitioned
    * write leaves ≤ n files per bucket dir instead of one per upstream
    * task per bucket. */
  private def bucketSized(cells: DataFrame, filesPerBucket: Int): DataFrame = {
    require(filesPerBucket >= 1, s"filesPerBucket must be >= 1, got $filesPerBucket")
    if (filesPerBucket == 1) cells.repartition(col("bucket"))
    else cells.repartition(col("bucket"),
      pmod(xxhash64(col("neighbor_id")), lit(filesPerBucket)))
  }

  /** `cellSchema`/`centroidSchema` are the DDL of the frames the writer
    * persisted (known statically at write time — recording them costs
    * nothing). Readers pass them to `spark.read.schema(...)`, so serving
    * never runs a footer-sampling schema-inference job (guide §6 — the
    * manifest is the source of truth, the Iceberg/Delta pattern; `Lake`'s
    * fingerprint cache does the same for raw tables). Empty on manifests
    * written before the field existed — readers then fall back to
    * inference. */
  private case class Manifest(gen: Long, planes: Int, trained: Boolean,
                              centroidDir: String, files: Map[String, Long],
                              batchId: Long = -1L,
                              cellSchema: String = "",
                              centroidSchema: String = "")

  /** DDL with every field relaxed to nullable — exactly the shape parquet
    * schema inference reports, so a manifest-schema read plans identically
    * to an inferred one (same downstream nullability, same output schema). */
  private def nullableDDL(s: org.apache.spark.sql.types.StructType): String =
    graft.Lake.nullableDDL(s)

  /** Data files only — success markers / CRCs / staged manifests are not
    * part of a generation's content. */
  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Recursive (path-relative-to-dir → length) listing of one `g=` dir. */
  private def listGenFiles(spark: SparkSession, dir: String,
                           gen: Long): Map[String, Long] = {
    val root = new Path(s"$dir/cells/g=$gen")
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) Map.empty
    else {
      val it = fs.listFiles(root, true)
      val out = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && isDataFile(f.getPath.getName)) {
          val full = f.getPath.toUri.getPath
          val rel = full.substring(full.indexOf("/cells/g=") + 1)
          out += (rel -> f.getLen)
        }
      }
      out.result()
    }
  }

  private def writeManifest(spark: SparkSession, dir: String,
                            m: Manifest): Unit = {
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val body = m.files.toSeq.sorted
      .map { case (p, len) => "\"" + p + "\":" + len }
      .mkString(
        s"""{"gen":${m.gen},"planes":${m.planes},"trained":${m.trained},""" +
          s""""batchId":${m.batchId},""" +
          s""""cellSchema":"${esc(m.cellSchema)}",""" +
          s""""centroidSchema":"${esc(m.centroidSchema)}",""" +
          s""""centroids":"${m.centroidDir}","files":{""", ",", "}}")
    val mDir = new Path(s"$dir/$ManifestDir")
    val fs = fsOf(spark, mDir)
    fs.mkdirs(mDir)
    val tmp = new Path(mDir, s".m=${m.gen}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val target = new Path(mDir, s"m=${m.gen}.json")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"index commit of g=${m.gen} lost the publish rename " +
          s"(concurrent writer?): $target")
  }

  private def readManifest(spark: SparkSession, dir: String,
                           gen: Long): Manifest = {
    val p = new Path(s"$dir/$ManifestDir/m=$gen.json")
    val fs = fsOf(spark, p)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(text)
    val files = j \ "files" match {
      case JObject(fields) => fields.collect {
        case (k, JInt(v))    => k -> v.toLong
        case (k, JDouble(v)) => k -> v.toLong
      }.toMap
      case other => throw new java.io.IOException(
        s"malformed index manifest m=$gen under $dir: $other")
    }
    def fail(field: String) = throw new java.io.IOException(
      s"malformed index manifest m=$gen under $dir: bad $field")
    val planes = j \ "planes" match { case JInt(v) => v.toInt; case _ => fail("planes") }
    val trained = j \ "trained" match { case JBool(v) => v; case _ => fail("trained") }
    val centroidDir = j \ "centroids" match { case JString(v) => v; case _ => fail("centroids") }
    val batchId = j \ "batchId" match { case JInt(v) => v.toLong; case _ => -1L }
    val cellSchema = j \ "cellSchema" match { case JString(v) => v; case _ => "" }
    val centroidSchema = j \ "centroidSchema" match { case JString(v) => v; case _ => "" }
    Manifest(gen, planes, trained, centroidDir, files, batchId,
      cellSchema, centroidSchema)
  }

  private def latestManifest(spark: SparkSession, dir: String,
                             gen: Long = -1L): Manifest = {
    val gens = generations(spark, dir)
    require(gens.nonEmpty, s"no committed index generations under $dir")
    val g = if (gen < 0) gens.last else gen
    require(gens.contains(g), s"generation $g not in $gens")
    readManifest(spark, dir, g)
  }

  /** Manifested cell rows `(neighbor_id, c_vec, bucket)` of a committed
    * generation (latest when `gen < 0`). The scan reads EXACTLY the
    * manifested files — orphans from a crashed writer are invisible —
    * and validates each manifested file's presence and length first, so
    * a half-vacuumed or externally-mutated index fails loudly instead of
    * serving a partial answer. `bucket` stays a PARTITION column of the
    * scan (basePath keeps directory inference), which is what lets probe
    * joins prune at file granularity. */
  def cells(spark: SparkSession, dir: String, gen: Long = -1L,
            validate: Boolean = true): DataFrame = {
    val m = latestManifest(spark, dir, gen)
    if (validate) validateManifest(spark, dir, m)
    if (m.files.isEmpty)
      return spark.range(0).select(col("id").as("neighbor_id"),
        array().cast("array<float>").as("c_vec"), lit(0).as("bucket"))
    val rd = spark.read.option("basePath", s"$dir/cells")
    val rdS = if (m.cellSchema.nonEmpty)
      rd.schema(org.apache.spark.sql.types.StructType.fromDDL(m.cellSchema))
    else rd // pre-schema manifest: one-time inference, as before
    rdS.parquet(m.files.keys.toSeq.sorted.map(f => s"$dir/$f"): _*)
      .select(col("neighbor_id"), col("c_vec"), col("bucket"))
  }

  /** A committed generation's centroid table `(bucket, centroid)`. */
  def centroids(spark: SparkSession, dir: String, gen: Long = -1L): DataFrame = {
    val m = latestManifest(spark, dir, gen)
    val rd = spark.read
    val rdS = if (m.centroidSchema.nonEmpty)
      rd.schema(org.apache.spark.sql.types.StructType.fromDDL(m.centroidSchema))
    else rd
    rdS.parquet(s"$dir/${m.centroidDir}")
  }

  private def validateManifest(spark: SparkSession, dir: String,
                               m: Manifest): Unit = {
    val fs = fsOf(spark, new Path(dir))
    val broken = m.files.collect {
      case (rel, len) =>
        val p = new Path(s"$dir/$rel")
        if (!fs.exists(p)) Some(s"$rel (missing)")
        else {
          val got = fs.getFileStatus(p).getLen
          if (got != len) Some(s"$rel (manifest $len bytes, on disk $got)")
          else None
        }
    }.flatten
    if (broken.nonEmpty)
      throw new java.io.IOException(
        s"index g=${m.gen} under $dir failed manifest validation: " +
          broken.mkString(", "))
  }

  /** Train and persist the index as generation `lastGen + 1`. An
    * existing index stays SERVABLE throughout — the new generation
    * becomes visible only at the manifest rename; `retain` then vacuums
    * to the newest `retain` generations (0 disables — e.g. when pinned
    * readers must keep resolving old generations).
    *
    * Deterministic for `kmeansIters = 0` (LSH-hyperplane cells — the
    * portable mode the s14 gate replays); trained cells
    * (`kmeansIters > 0`) trade that for occupancy balance.
    *
    * `filesPerBucket` bounds the cell-file count: without it every
    * upstream task writes its own sliver into every bucket dir it
    * touches (tasks × buckets files — a 100 TB build from tens of
    * thousands of tasks would leave millions of footers for `query` to
    * open, and even the sf0.1 gate left ~7 files per bucket). The
    * pre-write shuffle keys on (bucket, id-hash mod filesPerBucket) so
    * each bucket collapses to at most `filesPerBucket` files; size it
    * to corpusBytes / (2^planes · targetFileBytes). */
  def build(corpus: DataFrame, dir: String, idCol: String, vecCol: String,
            planes: Int = 4, kmeansIters: Int = 0, retain: Int = 2,
            filesPerBucket: Int = 1): Unit = {
    val spark = corpus.sparkSession
    val gen = allGenNumbers(spark, dir).lastOption.getOrElse(0L) + 1
    val (cellRows, centroidRows) =
      Similarity.trainCells(corpus, idCol, vecCol, planes, kmeansIters)
    val cellOut = cellRows.select(col("neighbor_id"), col("c_vec"), col("bucket"))
    bucketSized(cellOut, filesPerBucket)
      .write.mode("errorifexists").partitionBy("bucket")
      .parquet(s"$dir/cells/g=$gen")
    centroidRows.write.mode("errorifexists").parquet(s"$dir/centroids/g=$gen")
    writeManifest(spark, dir, Manifest(gen, planes, kmeansIters > 0,
      s"centroids/g=$gen", listGenFiles(spark, dir, gen),
      cellSchema = nullableDDL(cellOut.schema),
      centroidSchema = nullableDDL(centroidRows.schema)))
    if (retain > 0) vacuum(spark, dir, keepLast = retain)
  }

  /** Incremental index maintenance: route new vectors into the EXISTING
    * cells — the quantizer is not retrained, so the index absorbs a
    * delta batch at delta cost: assign + one partitioned delta write
    * (only the batch's rows land, under a fresh `g=` dir) + a centroid
    * refresh over the touched buckets' cells (bounded by their
    * occupancy, never the index size) + one manifest rename. Crash-safe
    * and retry-safe per the commit protocol above. LSH mode re-derives
    * the same deterministic hash assignment `build` used, so an
    * append-grown index holds cell-for-cell the data of a from-scratch
    * build (VectorIndexSpec pins this with full-probe query equality);
    * trained mode assigns to the nearest stored centroid — the standard
    * IVF insert, with the known drift caveat that heavy growth
    * eventually wants a re-[[build]] (centroids follow their cells here,
    * but the PARTITION of space is frozen).
    *
    * `batchId` makes a SUCCESSFUL append replay-safe (exactly-once for
    * streaming ingest): the manifest records the last absorbed id, and
    * an append whose id is at or below it is a no-op — the
    * SnapshotStream convention. Leave it -1 for one-shot batch use. */
  def append(newVecs: DataFrame, dir: String, idCol: String, vecCol: String,
             batchId: Long = -1L): Unit = {
    val spark = newVecs.sparkSession
    val prev = latestManifest(spark, dir)
    if (batchId >= 0 && prev.batchId >= batchId) return // replay: already absorbed
    val gen = allGenNumbers(spark, dir).lastOption.getOrElse(0L) + 1
    val v = newVecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val assigned =
      if (!prev.trained)
        v.withColumn("bucket",
          graft.functions.VectorFunctions.lshBucket(col("c_vec"), prev.planes))
      else {
        // nearest stored centroid by cosine; broadcast (≤2^planes rows),
        // one map-side-combined argmax — no window, no fan-out kept
        val cents = centroids(spark, dir, prev.gen)
        v.crossJoin(broadcast(cents))
          .withColumn("__sim", cosineHof(
            transform(col("c_vec"), x => x.cast("double")), col("centroid")))
          .groupBy("neighbor_id")
          .agg(first(col("c_vec")).as("c_vec"),
            max_by(col("bucket"), struct(col("__sim"), -col("bucket")))
              .as("bucket"))
      }
    bucketSized(assigned.select(col("neighbor_id"), col("c_vec"), col("bucket")),
        filesPerBucket = 1)
      .write.mode("errorifexists").partitionBy("bucket")
      .parquet(s"$dir/cells/g=$gen")
    val deltaFiles = listGenFiles(spark, dir, gen)
    if (deltaFiles.isEmpty) return // empty batch: nothing to commit
    // Touched-bucket centroid refresh: recompute means from the merged
    // cells so probe ranking tracks what the buckets now hold. The
    // touched-bucket list is ≤2^planes ids on the driver; untouched
    // centroid rows pass through unchanged. Only files under touched
    // bucket dirs are read — a path filter on the manifest, no footer
    // of an untouched bucket is opened.
    val touched = deltaFiles.keys
      .flatMap(p => "bucket=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt))
      .toSeq.distinct
    val mergedFiles = prev.files ++ deltaFiles
    val touchedPaths = mergedFiles.keys.toSeq.sorted
      .filter(p => touched.exists(b => p.contains(s"/bucket=$b/")))
    val touchedCells = spark.read.option("basePath", s"$dir/cells")
      .parquet(touchedPaths.map(f => s"$dir/$f"): _*)
      .select(col("neighbor_id"), col("c_vec"), col("bucket"))
    val dim = touchedCells.select(size(col("c_vec"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val fresh = Similarity.meanVectorsWide(
      touchedCells, "bucket", "c_vec", "centroid", dim)
    val kept = centroids(spark, dir, prev.gen)
      .where(!col("bucket").isin(touched: _*))
    val centOut = kept.unionByName(fresh)
    centOut.write.mode("errorifexists").parquet(s"$dir/centroids/g=$gen")
    writeManifest(spark, dir, Manifest(gen, prev.planes, prev.trained,
      s"centroids/g=$gen", mergedFiles, math.max(prev.batchId, batchId),
      cellSchema = nullableDDL(
        assigned.select(col("neighbor_id"), col("c_vec"), col("bucket")).schema),
      centroidSchema = nullableDDL(centOut.schema)))
  }

  /** Generation compaction: rewrite the CURRENT cell set as one fresh
    * `g=` dir (one partitioned write, one file batch per bucket) and
    * republish — a data-layout no-op that collapses a long append
    * chain's small delta files, the index-side analog of
    * [[LakeMaintenance.compactSnapshotInPlace]]. A continuous ingest
    * accretes one file set per absorbed batch; reads stay correct but
    * pay per-file open costs, so periodic compaction (+ [[vacuum]] to
    * reclaim the superseded generations) keeps the file count
    * proportional to buckets, not batches. The centroid table and
    * replay guard carry forward unchanged; assignments are not
    * recomputed, so the operation commutes with [[query]] exactly
    * (spec-pinned). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val prev = latestManifest(spark, dir)
    val gen = allGenNumbers(spark, dir).lastOption.getOrElse(0L) + 1
    val current = cells(spark, dir, prev.gen)
    // one task per bucket -> each bucket dir collapses to one file
    current.repartition(col("bucket"))
      .write.mode("errorifexists").partitionBy("bucket")
      .parquet(s"$dir/cells/g=$gen")
    writeManifest(spark, dir, Manifest(gen, prev.planes, prev.trained,
      prev.centroidDir, listGenFiles(spark, dir, gen), prev.batchId,
      cellSchema = nullableDDL(current.schema),
      centroidSchema = prev.centroidSchema))
  }

  /** Retention: keep the newest `keepLast` committed generations; delete
    * older manifests, then every `cells/g=`/`centroids/g=` artifact no
    * kept manifest references — which reclaims superseded centroid
    * tables, compacted-away cell generations AND crashed-writer orphans
    * (a `g=` dir below the newest commit with no manifest can only be a
    * dead writer's leftovers; one ABOVE it may be a writer mid-flight
    * and is left alone). Returns the deleted generation numbers. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val committed = generations(spark, dir)
    if (committed.isEmpty) return Seq.empty
    val keep = committed.takeRight(keepLast)
    val kept = keep.map(readManifest(spark, dir, _))
    // cells and centroids reference independently: an append's manifest
    // keeps the OLD generations' cell files but carries its OWN
    // centroid table, so the superseded centroid dirs free up even
    // while those cell dirs stay live
    val cellGens: Set[Long] = kept.flatMap(_.files.keys.flatMap(p =>
      "cells/g=(\\d+)/".r.findFirstMatchIn(p).map(_.group(1).toLong))).toSet
    val centroidGens: Set[Long] = kept.flatMap(m =>
      "centroids/g=(\\d+)".r.findFirstMatchIn(m.centroidDir)
        .map(_.group(1).toLong)).toSet
    val fs = fsOf(spark, new Path(dir))
    val dropped = committed.filterNot(keep.contains)
    dropped.foreach { g =>
      fs.delete(new Path(s"$dir/$ManifestDir/m=$g.json"), false)
    }
    // an unreferenced g-dir is safe to drop when it is not a possibly
    // in-flight writer (strictly above the newest commit). Kept
    // manifests can reference individual files inside an older g-dir —
    // referenced dirs are skipped wholesale, so nothing kept can break.
    def sweep(sub: String, referenced: Set[Long]): Unit = {
      val p = new Path(s"$dir/$sub")
      if (fs.exists(p)) fs.listStatus(p).toSeq
        .filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("g="))
        .foreach { gp =>
          val g = gp.getName.drop(2).toLong
          if (!referenced.contains(g) && g < committed.last)
            fs.delete(gp, true)
        }
    }
    sweep("cells", cellGens); sweep("centroids", centroidGens)
    dropped
  }

  /** Top-k cosine neighbors for each query row, served from the newest
    * committed generation (or a pinned `gen`): rank centroids per query
    * (tiny broadcast), probe the `nProbe` best buckets, exact-rank
    * within the probed cells. Same output contract as
    * [[Similarity.ivfTopK]]: (query_id, rank, neighbor_id, sim). */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
            idCol: String, vecCol: String, k: Int,
            nProbe: Int = 2, gen: Long = -1L): DataFrame = {
    val cents = centroids(spark, dir, gen)
    val cellScan = cells(spark, dir, gen)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(desc("c_sim"), asc("bucket"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("c_sim", cosineHof(
        transform(col("q_vec"), x => x.cast("double")), col("centroid")))
      .withColumn("c_rank", row_number().over(wProbe))
      .where(col("c_rank") <= nProbe)
      .select("query_id", "q_vec", "bucket")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    cellScan.join(broadcast(probes), "bucket")
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
