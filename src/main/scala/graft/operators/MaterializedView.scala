package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.hadoop.fs.Path
import scala.collection.concurrent.TrieMap

/** Materialized-view registry + builder: the declarative end of the
  * engine's view-routing loop.
  *
  * The engine already has the two halves of materialized-view SERVING:
  * q41's mergeable-partial maintenance (how a stored aggregate absorbs a
  * delta) and q59's join IVM. What was missing is ROUTING — a user query
  * that happens to BE the view's defining aggregate should read the
  * tiny view table, not re-scan the base. [[graft.plans.MaterializedViewRule]]
  * does that rewrite; this object owns the catalog it consults:
  *
  *  - [[MvAgg]]/[[create]] declare a view as (base path, group columns,
  *    aggregate list). `create` computes the aggregate ONCE, writes it
  *    to `mvPath`, snapshots the base's file-level fingerprint, and
  *    registers the definition.
  *  - The rule rewrites a matching `Aggregate` over the base scan into a
  *    scan of `mvPath` — but only while the CURRENT base fingerprint
  *    equals the snapshot, so a mutated base silently falls back to the
  *    direct scan (correctness is never conditional on freshness
  *    bookkeeping; the view just stops being used until [[refresh]]).
  *
  * Scale notes: the staleness probe is one file listing of the base per
  * optimization — the right call for a plain parquet dir at test scale,
  * and the scaladoc'd swap at 100 TB is a snapshot-versioned base
  * ([[LakeMaintenance.writeSnapshotVersion]]), where "has the base
  * changed" is one manifest read, O(1) in table size. The listing
  * fingerprint subsumes that case automatically (a new version writes
  * new manifest + data files). The REWRITE is where the scale win
  * lives: a grouped aggregate over a 100 TB base becomes a scan of a
  * |groups|-row table.
  */
object MaterializedView {

  /** One aggregate column of a view definition: `func` over `inputCol`
    * (optionally pre-cast to `castTo`, e.g. "decimal(18,6)" — the exact
    * shape the engine's decimal-sum convention produces), written as
    * `outCol`. Supported funcs: count_star, count, sum, min, max —
    * the self-maintainable aggregates (q41's merge family). */
  final case class MvAgg(func: String, inputCol: String = "",
                         castTo: Option[String] = None, outCol: String) {
    require(Set("count_star", "count", "sum", "min", "max")(func),
      s"unsupported MV aggregate: $func")
  }

  /** A derived grouping dimension: `sql` evaluated over the base (e.g.
    * `date_trunc('hour', ts)`), stored as column `name`. The routing
    * rule matches a query's grouping EXPRESSION against the resolved
    * template semantically (same canonical tree after remapping
    * attribute references by name), so the classic time-bucketed rollup
    * routes without the query naming the view. */
  final case class MvGroupExpr(name: String, sql: String)

  /** A join-backed view's second input: the base (fact) path INNER
    * equi-joins `rightPath` (dimension) on pairwise
    * `leftKeys(i) = rightKeys(i)`. Column names across the two inputs
    * must be disjoint (the star-schema convention — prefixed columns);
    * grouping/aggregate columns may come from either side. */
  final case class MvJoin(rightPath: String,
                          leftKeys: Seq[String], rightKeys: Seq[String]) {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "MvJoin needs one or more (leftKey, rightKey) pairs")
  }

  final case class MvDef(name: String, basePath: String,
                         groupCols: Seq[String], aggs: Seq[MvAgg],
                         mvPath: String, dataDir: String,
                         baseFingerprint: String,
                         relation: LogicalRelation,
                         lastBatchId: Long = -1L,
                         groupExprs: Seq[MvGroupExpr] = Nil,
                         /** resolved template per groupExpr, built once
                           * at create/load against a base scan; the
                           * rule remaps its attribute refs by NAME onto
                           * the query's scan before comparing. */
                         groupTemplates: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] = Nil,
                         join: Option[MvJoin] = None,
                         rightFingerprint: String = "")

  /** name -> definition; process-wide (sessions share the JVM). */
  private val catalog = TrieMap.empty[String, MvDef]

  def registered: Map[String, MvDef] = catalog.toMap

  def get(name: String): Option[MvDef] = catalog.get(name)

  def drop(name: String): Unit = catalog.remove(name)

  def dropAll(): Unit = catalog.clear()

  private def aggColumn(a: MvAgg): Column = {
    val in = a.castTo.map(t => col(a.inputCol).cast(t))
      .getOrElse(col(a.inputCol))
    val c = a.func match {
      case "count_star" => count(lit(1))
      case "count"      => count(in)
      case "sum"        => sum(in)
      case "min"        => min(in)
      case "max"        => max(in)
    }
    c.as(a.outCol)
  }

  /** File-level content fingerprint of a base path: every data file's
    * (relative path, length, modification time), sorted, hashed. Any
    * append/overwrite/compaction changes it; a snapshot-versioned base
    * changes it through its manifest + data files. */
  def fingerprint(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return "absent"
    val parts = Seq.newBuilder[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) {
        val full = f.getPath.toUri.getPath
        parts += s"$full:${f.getLen}:${f.getModificationTime}"
      }
    }
    val joined = parts.result().sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(joined.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def aggregateOf(df: DataFrame, groupings: Seq[Column],
                          aggCols: Seq[Column]): DataFrame =
    if (groupings.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
    else df.groupBy(groupings: _*).agg(aggCols.head, aggCols.tail: _*)

  private def groupingColumns(groupCols: Seq[String],
                              groupExprs: Seq[MvGroupExpr]): Seq[Column] =
    groupCols.map(col) ++ groupExprs.map(g => expr(g.sql).as(g.name))

  /** The defining aggregate as a DataFrame (what the view stores, and
    * what a routed query's answer must equal). */
  def definingQuery(spark: SparkSession, basePath: String,
                    groupCols: Seq[String], aggs: Seq[MvAgg],
                    groupExprs: Seq[MvGroupExpr] = Nil,
                    join: Option[MvJoin] = None): DataFrame = {
    val base = spark.read.parquet(basePath)
    val frame = join match {
      case None => base
      case Some(j) =>
        val right = spark.read.parquet(j.rightPath)
        base.join(right,
          j.leftKeys.zip(j.rightKeys)
            .map { case (l, r) => base(l) === right(r) }
            .reduce(_ && _), "inner")
    }
    aggregateOf(frame, groupingColumns(groupCols, groupExprs),
      aggs.map(aggColumn))
  }

  /** Resolve each groupExpr against a base scan ONCE; the rule compares
    * these templates (attribute refs remapped by name) against query
    * grouping expressions. */
  private def resolveTemplates(spark: SparkSession, basePath: String,
                               groupExprs: Seq[MvGroupExpr])
      : Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] =
    if (groupExprs.isEmpty) Nil
    else {
      val base = spark.read.parquet(basePath)
      groupExprs.map { g =>
        val analyzed = base.select(expr(g.sql).as(g.name))
          .queryExecution.analyzed
        val template = analyzed.collectFirst {
          case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
            p.projectList.head match {
              case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
              case e => e
            }
        }.getOrElse(throw new IllegalArgumentException(
          s"could not resolve MV group expression '${g.sql}'"))
        g.name -> template
      }
    }

  /** Next `gen-<n>` dir under the view root plus the generations that
    * preceded it (for post-publish vacuum). */
  private def nextGen(spark: SparkSession, mvPath: String): (String, Seq[Long]) = {
    val root = new Path(mvPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val gens: Seq[Long] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("gen-") => s.drop(4).toLong }
        .sorted
    (s"$mvPath/gen-${gens.lastOption.getOrElse(0L) + 1}", gens)
  }

  /** Write `content` as a fresh generation, persist the definition as
    * `_mvdef.json` (temp + atomic rename — [[load]]'s recovery record),
    * register it (the pointer swap IS the in-process commit), then
    * best-effort-vacuum generations older than the previous one (plans
    * optimized before this publish may still read it). */
  private def publish(spark: SparkSession, name: String, basePath: String,
                      groupCols: Seq[String], aggs: Seq[MvAgg],
                      mvPath: String, baseFp: String,
                      content: DataFrame, lastBatchId: Long,
                      groupExprs: Seq[MvGroupExpr],
                      join: Option[MvJoin], rightFp: String): MvDef = {
    val (dataDir, gens) = nextGen(spark, mvPath)
    content.write.mode("errorifexists").parquet(dataDir)
    val rel = spark.read.parquet(dataDir).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(throw new IllegalStateException(
        s"materialized view at $dataDir did not analyze to a file relation"))
    val d = MvDef(name, basePath, groupCols, aggs, mvPath, dataDir, baseFp,
      rel, lastBatchId, groupExprs,
      resolveTemplates(spark, basePath, groupExprs), join, rightFp)
    writeDefJson(spark, d)
    catalog.put(name, d)
    val fs = new Path(mvPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    gens.dropRight(1).foreach(g => fs.delete(new Path(s"$mvPath/gen-$g"), true))
    d
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def writeDefJson(spark: SparkSession, d: MvDef): Unit = {
    val aggsJson = d.aggs.map(a =>
      s"""{"func":${jsonStr(a.func)},"inputCol":${jsonStr(a.inputCol)},""" +
        s""""castTo":${a.castTo.map(jsonStr).getOrElse("null")},""" +
        s""""outCol":${jsonStr(a.outCol)}}""").mkString("[", ",", "]")
    val groupExprsJson = d.groupExprs.map(g =>
      s"""{"name":${jsonStr(g.name)},"sql":${jsonStr(g.sql)}}""")
      .mkString("[", ",", "]")
    val joinJson = d.join.map(j =>
      s"""{"rightPath":${jsonStr(j.rightPath)},""" +
        s""""leftKeys":${j.leftKeys.map(jsonStr).mkString("[", ",", "]")},""" +
        s""""rightKeys":${j.rightKeys.map(jsonStr).mkString("[", ",", "]")}}""")
      .getOrElse("null")
    val body =
      s"""{"name":${jsonStr(d.name)},"basePath":${jsonStr(d.basePath)},""" +
        s""""groupCols":${d.groupCols.map(jsonStr).mkString("[", ",", "]")},""" +
        s""""groupExprs":$groupExprsJson,"join":$joinJson,""" +
        s""""rightFingerprint":${jsonStr(d.rightFingerprint)},""" +
        s""""aggs":$aggsJson,"dataDir":${jsonStr(d.dataDir)},""" +
        s""""baseFingerprint":${jsonStr(d.baseFingerprint)},""" +
        s""""lastBatchId":${d.lastBatchId}}"""
    val root = new Path(d.mvPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(root)
    val tmp = new Path(root, "._mvdef.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val target = new Path(root, "_mvdef.json")
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"could not publish $target")
  }

  /** Re-register a view from its persisted `_mvdef.json` (a new JVM's
    * recovery path — the in-memory catalog dies with the process, the
    * definition and data do not). The stored dataDir must still exist;
    * freshness is re-judged against the CURRENT base on every routing
    * decision as usual, so a base that moved on while the process was
    * down simply doesn't route until refresh/absorb. */
  def load(spark: SparkSession, mvPath: String): MvDef = {
    val p = new Path(s"$mvPath/_mvdef.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(text)
    def str(f: String): String = j \ f match {
      case JString(s) => s
      case other => throw new java.io.IOException(s"bad _mvdef.json $f: $other")
    }
    val groupCols = j \ "groupCols" match {
      case JArray(xs) => xs.map { case JString(s) => s
        case other => throw new java.io.IOException(s"bad groupCol: $other") }
      case other => throw new java.io.IOException(s"bad groupCols: $other")
    }
    val aggs = j \ "aggs" match {
      case JArray(xs) => xs.map { a =>
        MvAgg(
          a \ "func" match { case JString(s) => s; case _ => "?" },
          a \ "inputCol" match { case JString(s) => s; case _ => "" },
          a \ "castTo" match { case JString(s) => Some(s); case _ => None },
          outCol = a \ "outCol" match { case JString(s) => s; case _ => "?" })
      }
      case other => throw new java.io.IOException(s"bad aggs: $other")
    }
    val lastBatchId = j \ "lastBatchId" match {
      case JInt(v) => v.toLong
      case _ => -1L
    }
    val groupExprs = j \ "groupExprs" match {
      case JArray(xs) => xs.map { g =>
        MvGroupExpr(
          g \ "name" match { case JString(s) => s; case _ => "?" },
          g \ "sql" match { case JString(s) => s; case _ => "?" })
      }
      case _ => Nil // pre-groupExprs definition records
    }
    def strList(v: JValue): Seq[String] = v match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }
    val join = j \ "join" match {
      case JObject(_) => Some(MvJoin(
        j \ "join" \ "rightPath" match { case JString(s) => s; case _ => "?" },
        strList(j \ "join" \ "leftKeys"),
        strList(j \ "join" \ "rightKeys")))
      case _ => None
    }
    val rightFp = j \ "rightFingerprint" match {
      case JString(s) => s
      case _ => ""
    }
    val dataDir = str("dataDir")
    val rel = spark.read.parquet(dataDir).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(throw new IllegalStateException(
        s"materialized view at $dataDir did not analyze to a file relation"))
    val basePath = str("basePath")
    val d = MvDef(str("name"), basePath, groupCols, aggs, mvPath,
      dataDir, str("baseFingerprint"), rel, lastBatchId, groupExprs,
      resolveTemplates(spark, basePath, groupExprs), join, rightFp)
    catalog.put(d.name, d)
    d
  }

  /** Compute, persist and register the view. The stored table holds
    * groupCols ++ agg outCols; the registered relation is re-read AFTER
    * the write so its file index sees exactly the persisted files.
    *
    * Each create/refresh writes a FRESH `gen-<n>` dir under `mvPath`
    * rather than overwriting in place — two lessons baked in:
    *  - self-route: the defining query is by construction EXACTLY the
    *    shape the rule rewrites, so recomputing an already-registered
    *    view with routing enabled would read the view's own files while
    *    the overwrite deletes them (FILE_NOT_EXIST mid-write; caught by
    *    RegistrySpec the first time). The registration is dropped for
    *    the duration of the recompute, and the write lands in a
    *    directory no reader has ever seen.
    *  - reader safety: an already-optimized plan holds the PREVIOUS
    *    generation's file list; in-place overwrite would break it at
    *    execution time. Generations make recreate publish-by-pointer —
    *    the catalog swaps to the new dir, existing plans keep reading
    *    the old one (the snapshot-family protocol, minus the manifest:
    *    this catalog is in-memory, so the pointer swap IS the commit).
    * Older generations beyond the previous one are vacuumed best-effort. */
  def create(spark: SparkSession, name: String, basePath: String,
             groupCols: Seq[String], aggs: Seq[MvAgg],
             mvPath: String, groupExprs: Seq[MvGroupExpr] = Nil,
             join: Option[MvJoin] = None): MvDef = {
    require(aggs.nonEmpty, "a view needs at least one aggregate column")
    require(join.isEmpty || groupExprs.isEmpty,
      "join-backed views with derived grouping dimensions are not supported")
    // a refresh carries the replay guard forward: the recomputed view
    // already CONTAINS every absorbed batch's rows (they are in the
    // base), so a crash-replayed batch arriving after the refresh must
    // still be recognized as absorbed
    val carried = catalog.get(name).map(_.lastBatchId).getOrElse(-1L)
    catalog.remove(name) // the defining query must never route to itself
    val fp = fingerprint(spark, basePath)
    val rightFp = join.map(jn => fingerprint(spark, jn.rightPath)).getOrElse("")
    publish(spark, name, basePath, groupCols, aggs, mvPath, fp,
      definingQuery(spark, basePath, groupCols, aggs, groupExprs, join),
      carried, groupExprs, join, rightFp)
  }

  /** Delta-cost maintenance — q41's merge family wired to routing. The
    * caller has ALREADY appended `delta` to the base; absorb folds the
    * delta's partials into the stored view at |delta| + |groups| cost
    * (the base is never re-read) and publishes a new generation whose
    * fingerprint snapshots the post-append base, so routing re-arms
    * without a full recompute. The supported aggregate family is
    * self-maintainable under APPEND by construction: counts and sums
    * merge by summing partials, min/max by min/max. Each merged column
    * is cast back to its STORED type — re-aggregating a decimal sum
    * widens the precision, and the stored type is the routing
    * contract. merge ≡ recompute is law-pinned in MaterializedViewSpec.
    *
    * The contract is the caller's to honor: `delta` must be exactly the
    * rows appended since the last create/refresh/absorb. (With a
    * snapshot-versioned base the delta IS the version diff — q42's
    * change feed; with a raw dir it is the batch just written.)
    *
    * `batchId >= 0` makes a SUCCESSFUL absorb replay-safe for streaming
    * maintenance ([[graft.streaming.MvStream]]): the id persists with
    * the definition, and an absorb at or below it is a no-op — absorb
    * is NOT idempotent by itself (replaying a delta double-counts), the
    * guard is what makes exactly-once hold across crash-replays. Leave
    * -1 for one-shot batch use. */
  def absorb(spark: SparkSession, name: String, delta: DataFrame,
             batchId: Long = -1L): MvDef = {
    val d = catalog.getOrElse(name,
      throw new NoSuchElementException(s"no materialized view named $name"))
    require(d.join.isEmpty,
      s"absorb on join-backed view '$name' is not supported: a base delta " +
        "changes JOINED groups (the q59 IncrementalJoin delta algebra is " +
        "the right primitive) — use refresh")
    if (batchId >= 0 && d.lastBatchId >= batchId) return d // replayed
    val fp = fingerprint(spark, d.basePath)
    catalog.remove(name) // no routing against the view mid-republish
    val storedTypes = d.relation.output.map(a => a.name -> a.dataType).toMap
    val stored = spark.read.parquet(d.dataDir)
    val deltaAgg = aggregateOf(delta,
      groupingColumns(d.groupCols, d.groupExprs), d.aggs.map(aggColumn))
    val mergeCols = d.aggs.map { a =>
      val c = a.func match {
        case "count_star" | "count" | "sum" => sum(col(a.outCol))
        case "min"                          => min(col(a.outCol))
        case "max"                          => max(col(a.outCol))
      }
      c.cast(storedTypes(a.outCol)).as(a.outCol)
    }
    // the stored table holds every grouping DIMENSION as a plain
    // column (groupCols and groupExpr names alike), so the merge
    // re-groups on names — no expression re-evaluation
    val mergeKeys = (d.groupCols ++ d.groupExprs.map(_.name)).map(col)
    val merged = aggregateOf(stored.unionByName(deltaAgg),
      mergeKeys, mergeCols)
    publish(spark, name, d.basePath, d.groupCols, d.aggs, d.mvPath, fp,
      merged, math.max(d.lastBatchId, batchId), d.groupExprs, None, "")
  }

  /** Recompute the view against the CURRENT base and re-arm routing
    * (fresh fingerprint). Full recompute — the incremental path is
    * q41's merge applied to a delta feed; composing the two is the
    * maintenance pipeline's job, not the catalog's. */
  def refresh(spark: SparkSession, name: String): MvDef = {
    val d = catalog.getOrElse(name,
      throw new NoSuchElementException(s"no materialized view named $name"))
    create(spark, name, d.basePath, d.groupCols, d.aggs, d.mvPath,
      d.groupExprs, d.join)
  }

  /** True while routing to `name` is sound: every input unchanged since
    * the last create/refresh/absorb (a join-backed view checks BOTH
    * sides — a dimension update invalidates the rollup too). */
  def isFresh(spark: SparkSession, name: String): Boolean =
    catalog.get(name).exists(d =>
      fingerprint(spark, d.basePath) == d.baseFingerprint &&
        d.join.forall(jn =>
          fingerprint(spark, jn.rightPath) == d.rightFingerprint))
}
