package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorSpec extends AnyFunSuite {
  import TestSpark._

  test("fused cosine expression is bit-identical to the HOF composition") {
    val emb = Lake(spark, sf0001).embeddings.limit(100)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).where(col("ia") < col("ib")).limit(2000)
      .select(
        VectorFunctions.cosine(col("va"), col("vb")).as("fused"),
        VectorFunctions.cosineHof(col("va"), col("vb")).as("hof"))
    val mismatches = pairs.where(col("fused") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("cosine handles nulls and zero vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),   // identical -> 1.0
      (Array(0f, 0f), Array(1f, 0f))    // zero norm -> 0.0, not NaN
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(got(0) === 1.0 && got(1) === 0.0)
    val withNull = df.select(
      VectorFunctions.cosine(lit(null).cast("array<float>"), col("b"))).collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("cosine accepts array<double> and mixed widths; rejects non-arrays") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(3.0, 2.0, 1.0))).toDF("f", "d")
    // double-width right side read as doubles, not misread float slots
    val mixed = df.select(VectorFunctions.cosine(col("f"), col("d"))).as[Double].head()
    val expected = (3.0 + 4.0 + 3.0) / (math.sqrt(1 + 4 + 9) * math.sqrt(9 + 4 + 1))
    assert(math.abs(mixed - expected) < 1e-12)
    val dd = df.select(VectorFunctions.cosine(col("d"), col("d"))).as[Double].head()
    assert(math.abs(dd - 1.0) < 1e-12)
    // SQL surface: transform() yields array<double> — must be correct too
    df.createOrReplaceTempView("cos_types")
    val viaSql = spark.sql(
      "SELECT cosine_similarity(transform(f, x -> CAST(x AS DOUBLE)), d) FROM cos_types")
      .as[Double].head()
    assert(math.abs(viaSql - expected) < 1e-12)
    // wrong element type is an analysis error, not a silent misread
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array('a','b'), array('c')) ").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_similarity") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
    // wrong arity fails with a clear message, not IndexOutOfBounds
    val arity = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0f))").collect()
    }
    assert(!arity.isInstanceOf[IndexOutOfBoundsException])
  }

  test("LSH bucketing always retrieves an identical vector (self-recall 1.0)") {
    // Driver embeddings are near-random (max pairwise cosine ~0.5), so
    // general top-k recall at planes=4 is legitimately low (~(1-θ/π)^4).
    // The property that must hold exactly: an identical vector lands in
    // the same bucket every time, so querying with corpus members returns
    // the member itself at rank 1 with sim ~1.
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10)
    val queries = corpus.limit(10)
    val top1 = Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 1, planes = 4)
      .where(col("rank") === 1).collect()
    assert(top1.length === 10)
    assert(top1.forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
    assert(top1.forall(r => math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9))
  }

  test("multi-probe LSH recall strictly dominates single-probe") {
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10)
    val queries = emb.where(col("vec_id") < 10)
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    def recall(probes: Int): Double = {
      val approx = ids(Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
        5, planes = 4, multiProbe = probes))
      (exact intersect approx).size.toDouble / exact.size
    }
    val r0 = recall(0)
    val r4 = recall(4)
    assert(r4 >= r0, s"multi-probe recall $r4 must not be below single-probe $r0")
    assert(r4 > 0.3, s"4-probe recall $r4 unexpectedly low")
  }

  test("IVF probing returns k rows per query and beats own-bucket LSH recall") {
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10)
    val queries = emb.where(col("vec_id") < 10)
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    val ivf = ids(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5,
      planes = 4, nProbe = 4))
    val lsh1 = ids(Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 5,
      planes = 4, multiProbe = 0))
    def recall(s: Set[(Long, Long)]) = (exact intersect s).size.toDouble / exact.size
    assert(ivf.groupBy(_._1).forall(_._2.size == 5), "k rows per query")
    assert(recall(ivf) >= recall(lsh1),
      s"IVF(nProbe=4) recall ${recall(ivf)} below own-bucket LSH ${recall(lsh1)}")
  }

  test("pre-normalized top-k ranks identically to the direct cosine form") {
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10)
    val queries = emb.where(col("vec_id") < 10)
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
    val direct = ranks(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5))
    val prenorm = ranks(Similarity.bruteForceTopKPrenormed(corpus, queries, "vec_id", "embedding", 5))
    assert(prenorm === direct)
  }

  test("k-means training re-balances IVF cells and aligns them with real clusters") {
    import spark.implicits._
    // 4 clusters all near e0 (angularly close): random hyperplanes through
    // the origin leave them piled into few LSH buckets — the case where
    // trained cells beat hash cells
    val vecs = for { c <- 0 until 4; j <- 0 until 50 } yield {
      val id = (c * 50 + j).toLong
      val v = Array.fill(8)(0f)
      v(0) = 10f
      v(c + 1) = 3f
      (id, v.zipWithIndex.map { case (x, d) => x + ((id * 37 + d * 13) % 11).toFloat / 20f })
    }
    val df = vecs.toDF("vec_id", "embedding")
    def occupancy(iters: Int): Seq[Long] =
      Similarity.ivfCells(df, "vec_id", "embedding", planes = 2, kmeansIters = iters)
        .groupBy("bucket").count().collect().map(_.getLong(1)).sorted.reverse.toSeq
    val untrained = occupancy(0)
    val trained = occupancy(2)
    assert(untrained.max >= 100, s"fixture should skew LSH buckets, got $untrained")
    assert(trained.length === 4 && trained.max <= 60,
      s"2 Lloyd iterations should balance cells to the true clusters, got $trained")
    // aligned cells => nProbe=1 already achieves exact recall
    val queries = df.where(col("vec_id") % 40 === 0)
    def ids(r: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      r.select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val exact = ids(Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 3))
    val trainedIvf = ids(Similarity.ivfTopK(df, queries, "vec_id", "embedding", 3,
      planes = 2, nProbe = 1, kmeansIters = 2))
    assert(trainedIvf === exact)
  }

  test("IVF training plans shuffle no corpus rows: no window, no posexplode") {
    import spark.implicits._
    val df = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat / 13f))
    }.toDF("vec_id", "embedding")
    // trained assignment = scan + narrow argmax projection (the centroid
    // set is a driver-side literal): the corpus never crossJoin-fans-out
    // and never passes through a row_number window
    val (assigned, _) = Similarity.trainCells(df, "vec_id", "embedding",
      planes = 2, kmeansIters = 2)
    val trainedPlan = assigned.queryExecution.executedPlan.toString
    for (bad <- Seq("Window", "Generate", "NestedLoop"))
      assert(!trainedPlan.contains(bad), s"trained-assignment plan has $bad:\n$trainedPlan")
    // untrained centroid means aggregate width-wise: no posexplode fan-out
    val (_, centroids) = Similarity.trainCells(df, "vec_id", "embedding",
      planes = 2, kmeansIters = 0)
    val meansPlan = centroids.queryExecution.executedPlan.toString
    for (bad <- Seq("Window", "Generate"))
      assert(!meansPlan.contains(bad), s"centroid-means plan has $bad:\n$meansPlan")
  }

  test("uint8 quantization round-trips within one code step") {
    import graft.functions.VectorFunctions
    val emb = Lake(spark, sf0001).embeddings
    val q = emb.select(col("vec_id"), col("embedding"),
        VectorFunctions.quantizeUint8(col("embedding")).as("q"))
      .withColumn("deq", VectorFunctions.dequantizeUint8(col("q")))
      .withColumn("step", (col("q.hi") - col("q.lo")) / 255.0)
      .withColumn("max_err", aggregate(
        zip_with(col("embedding"), col("deq"),
          (x, y) => abs(x.cast("double") - y)),
        lit(0.0), (a, b) => greatest(a, b)))
    assert(q.where(col("max_err") > col("step") + lit(1e-12)).count() === 0)
    assert(q.count() > 0)
    // constant vector degenerates to all-zero codes (hi == lo)
    import spark.implicits._
    val const = Seq((1L, Array(2.5f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val codes = const
      .select(VectorFunctions.quantizeUint8(col("embedding")).getField("codes"))
      .head.getSeq[Int](0)
    assert(codes.forall(_ == 0))
  }

  test("adaptivePlanes keeps expected bucket occupancy at or under target") {
    for (n <- Seq(50L, 256L, 1024L, 4096L, 1000000L, 10000000000L); t <- Seq(64L, 2048L)) {
      val p = Similarity.adaptivePlanes(n, t)
      assert(p >= 1 && p <= 24)
      if (p < 24) // below the clamp, occupancy n/2^p is bounded by target
        assert(n.toDouble / (1L << p) <= t.toDouble,
          s"n=$n target=$t planes=$p leaves occupancy ${n / (1L << p)}")
    }
    // monotone in n: more corpus, never fewer planes
    val seq = Seq(100L, 1000L, 10000L, 100000L).map(Similarity.adaptivePlanes(_, 64))
    assert(seq === seq.sorted)
  }

  test("adaptive near-dup bucketing splits the corpus and finds planted dups") {
    val emb = Lake(spark, sf001).embeddings
    val planted = emb.where(col("vec_id") < 20)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(planted)
    val n = corpus.count()
    val p = Similarity.adaptivePlanes(n, 64)
    val pairs = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.95, targetBucketRows = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical copies agree on every hyperplane sign in every table, so
    // recall of the planted pairs is exactly 1; nothing else sits >= 0.95
    assert(pairs === (0L until 20L).map(i => (i, i + 10000L)).toSet)
    // the adaptive plane count genuinely splits the corpus
    val occ = corpus.select(VectorFunctions.lshBucket(col("embedding"), p).as("b"))
      .groupBy("b").count().agg(max("count")).head().getLong(0)
    assert(occ < n / 2, s"max bucket $occ of $n rows — bucketing did not split")
  }

  test("approx_count_distinct (HLL) lands within its error bound") {
    val li = Lake(spark, sf001).lineitem
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL estimate $approx vs exact $exact")
  }

  test("semDedup drops smaller-id neighbors only within a cluster") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1f, 1f)),       // cluster 3
      (1L, Array(0.9f, 1.1f)),   // cluster 3, cos vs 0 ~0.995 -> dropped
      (2L, Array(0.001f, 1f)),   // cluster 3... sign(0.001)>=0 -> bit set
      (3L, Array(-0.001f, 1f)),  // cluster 2: near-identical to 2 but cross-cluster
      (4L, Array(-1f, -1f))      // cluster 0, alone
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(df, "vec_id", "embedding",
        threshold = 0.9, signDims = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // 1 has a smaller-id same-cluster neighbor above threshold; 3's only
    // near-identical partner (2) sits in another cluster -> kept
    assert(got === Map(0L -> true, 1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("single-cluster semDedup equals the exact near-dup pair formulation") {
    val emb = Lake(spark, sf0001).embeddings
    val one = emb.select(col("vec_id"), lit(0).as("cluster"))
    val dropped = Similarity.semDedup(emb, "vec_id", "embedding",
        threshold = 0.45, clusters = Some(one))
      .where(!col("kept")).collect().map(_.getLong(0)).toSet
    // with one global cluster, the drop set is exactly the id_b side of
    // the exact all-pairs near-dup scan at the same threshold
    val pairsB = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.45, planes = 0)
      .select("id_b").collect().map(_.getLong(0)).toSet
    assert(dropped === pairsB)
  }

  test("semDedup honors a caller-supplied cluster assignment") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1f, 1f)), (1L, Array(0.9f, 1.1f)),
      (2L, Array(0.001f, 1f)), (3L, Array(-0.001f, 1f))
    ).toDF("vec_id", "embedding")
    val one = df.select(col("vec_id"), lit(0).as("cluster"))
    val got = Similarity.semDedup(df, "vec_id", "embedding", threshold = 0.9,
        clusters = Some(one))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // single global cluster: 1 drops under 0, 3 drops under 2
    assert(got === Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
  }

  test("mmrRerank at lambda=1 is plain top-k of its candidate stage") {
    // with no diversity penalty the greedy must reproduce the fetcher's
    // own ranking — for the EXACT fetcher and for a REAL-planes ANN
    // fetcher alike (the pluggable path exercised with actual buckets)
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10)
    val query = emb.where(col("vec_id") === 3)
    val fetchers: Seq[Similarity.CandidateFetcher] = Seq(
      Similarity.bruteForceTopK,
      Similarity.lshTopK(_, _, _, _, _, planes = 3, multiProbe = 2))
    for (f <- fetchers) {
      val mmr = Similarity.mmrRerank(corpus, query, "vec_id", "embedding",
          k = 5, fetch = 12, lambda = 1.0, candidates = f)
        .orderBy("rank").collect().map(r => r.getInt(1) -> r.getLong(2))
      val topk = f(corpus, query, "vec_id", "embedding", 12)
        .where(col("rank") <= 5).orderBy("rank")
        .collect().map(r => r.getInt(1) -> r.getLong(2))
      assert(mmr.toSeq === topk.toSeq)
    }
  }

  test("mmrRerank reranks each query independently") {
    // two queries in one call must equal two single-query calls — the
    // pools may not blend (the round-6 multi-query bug)
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10)
    def run(queryPred: org.apache.spark.sql.Column) =
      Similarity.mmrRerank(corpus, emb.where(queryPred), "vec_id",
          "embedding", k = 4, fetch = 10, lambda = 0.6)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val together = run(col("vec_id").isin(0, 7))
    val apart = run(col("vec_id") === 0) ++ run(col("vec_id") === 7)
    assert(together === apart)
    assert(together.map(_._1) === Set(0L, 7L))
  }

  test("mmrRerank stops at the pool when candidates run short of k") {
    import spark.implicits._
    // 3-row corpus, k=5: must return 3 ranked rows, not throw on an
    // exhausted pool (the empty-minBy hole)
    val corpus = Seq(
      (10L, Array(1f, 0f)), (11L, Array(0.9f, 0.1f)), (12L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val query = Seq((0L, Array(1f, 0.05f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(corpus, query, "vec_id", "embedding",
      k = 5, fetch = 8, lambda = 0.7).orderBy("rank").collect()
    assert(got.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
    assert(got.map(_.getLong(2)).toSet === Set(10L, 11L, 12L))
  }

  test("semanticDecontaminate: exact mode equals the naive predicate, ANN only loses recall") {
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10).select("vec_id", "embedding")
    val bench = emb.where(col("vec_id") < 10)
    def flagged(planes: Int, tables: Int = 2): Set[Long] =
      Similarity.semanticDecontaminate(corpus, bench, "vec_id", "embedding",
          threshold = 0.35, planes = planes, tables = tables)
        .where(col("contaminated")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    val naive = corpus.as("c").crossJoin(
        bench.select(col("embedding").as("w")))
      .where(VectorFunctions.cosine(col("embedding"), col("w")) >= 0.35)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(naive.nonEmpty, "fixture must contain contamination at this threshold")
    // planes = 0: single bucket = exact
    assert(flagged(0) === naive)
    // real planes: exact cosine filter on candidates -> no false
    // positives ever; banding can only MISS (subset), and more tables
    // can only recover (monotone recall)
    val oneTable = flagged(6, tables = 1)
    val threeTables = flagged(6, tables = 3)
    assert(oneTable.subsetOf(naive))
    assert(threeTables.subsetOf(naive))
    assert(oneTable.subsetOf(threeTables))
    // every corpus row survives with a verdict (no row loss/duplication)
    val out = Similarity.semanticDecontaminate(corpus, bench,
      "vec_id", "embedding", threshold = 0.35, planes = 4)
    assert(out.count() === corpus.count())
    assert(out.select("vec_id").distinct().count() === corpus.count())
  }

  test("semanticDecontaminate keeps a caller column literally named 'id'") {
    // drop-by-name regression: the hits side once joined under "id", so
    // .drop("id") also removed the CALLER's id column from the output
    val emb = Lake(spark, sf0001).embeddings
    val corpus = emb.where(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    val bench = emb.where(col("vec_id") < 10)
    val out = Similarity.semanticDecontaminate(corpus, bench,
      "id", "embedding", threshold = 0.35, planes = 0)
    assert(out.columns.toSeq === Seq("id", "embedding", "contaminated"))
    assert(out.select("id").distinct().count() === corpus.count())
  }

  test("mmrRerank rejects an unbounded query frame with an actionable error") {
    import spark.implicits._
    val corpus = Seq((10L, Array(1f, 0f)), (11L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val bigQuery = spark.range(0, 50)
      .select(col("id").as("vec_id"),
        array(lit(1f), lit(0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(corpus, bigQuery, "vec_id", "embedding",
        k = 1, fetch = 2, maxQueries = 10)
    }
    assert(e.getMessage.contains("maxQueries"))
    // at or under the bound the rerank runs normally
    val small = bigQuery.where(col("vec_id") < 10)
    assert(Similarity.mmrRerank(corpus, small, "vec_id", "embedding",
      k = 1, fetch = 2, maxQueries = 10).count() === 10L)
  }

  test("rrfFuse sums 1/(k+rank) per list, absent ids contribute nothing") {
    import spark.implicits._
    val lexical = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val semantic = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rank")
    val got = Similarity
      .rrfFuse(Seq(lexical, semantic), "doc_id", "rank", kRrf = 60)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, 1.0 / 61, 1L),
      (2L, 1.0 / 62 + 1.0 / 61, 2L), // both lists; IEEE 2-term sum exact
      (3L, 1.0 / 63, 1L),
      (4L, 1.0 / 62, 1L)))
    // a doc in every list always outscores a doc strictly below it in
    // every list (rank dominance)
    val fused = got.map(t => t._1 -> t._2).toMap
    assert(fused(2L) > fused(1L))
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq.empty, "doc_id", "rank")
    }
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq(lexical), "doc_id", "rank", kRrf = 0)
    }
  }
}
