package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  import TestSpark._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH finds every exact-Jaccard pair at the same threshold") {
    val docs = Lake(spark, sf0001).documents
    val exact = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8))
    val lsh = pairs(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 8, 0.8))
    // LSH verifies candidates with exact Jaccard, so lsh ⊆ exact always;
    // at these similarities (planted dups ~0.97) banding recall is ~1.
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact, s"missed ${(exact diff lsh).size} of ${exact.size} pairs")
  }

  test("xxhash64 and md5-portable MinHash families yield the same pair behavior") {
    // Both families band-and-verify, so each output ⊆ exact pairs by
    // construction. Banding recall per pair is 1-(1-j^rows)^bands — a
    // property of the CONFIG, not the hash family: at 8 rows/band a
    // j=0.91 borderline pair has a ~0.7% per-family miss chance (and the
    // families miss independently), while at 4 rows/band the miss
    // probability is ~1e-7 even at j=0.89. The spec therefore pins
    // (a) exact-set equality of both families at 16x4 banding and
    // (b) full recall of the planted high-sim dups (j >= 0.95) at the
    // d2 production shape (8x8) — the guarantee d2 actually relies on.
    val docs = Lake(spark, sf0001).documents
    val exact8 = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8))
    val xx16 = pairs(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8,
      family = Dedup.XxMinHash))
    val md516 = pairs(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8,
      family = Dedup.Md5MinHash))
    assert(xx16 === md516)
    assert(md516 === exact8)
    assert(exact8.nonEmpty)
    val high = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.95))
    val xx8 = pairs(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 8, 0.95,
      family = Dedup.XxMinHash))
    val md58 = pairs(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 8, 0.95,
      family = Dedup.Md5MinHash))
    assert(xx8 === high)
    assert(md58 === high)
    assert(high.nonEmpty)
  }

  test("dedupExact keeps the smallest tie-break row per group, deterministically") {
    import spark.implicits._
    val df = Seq((3L, "x"), (1L, "x"), (2L, "x"), (7L, "y"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupExact(df, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 7L))
  }

  test("LSH pairs from persisted signatures equal the one-shot form") {
    val docs = Lake(spark, sf0001).documents
    val oneShot = pairs(Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 8, 0.8))
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64).persist()
    try {
      val fromSigs = pairs(Dedup.minHashLshPairsFromSignatures(
        docs, sigs, "doc_id", "text", 3, 64, 8, 0.8))
      assert(fromSigs === oneShot)
      assert(fromSigs.nonEmpty)
    } finally sigs.unpersist()
  }

  test("dedupNear yields identical survivors under all three clustering paths") {
    val docs = Lake(spark, sf0001).documents
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // driverClusterMaxEdges = 0 forces the distributed algorithms; the
    // default routes broadcast-scale pair graphs through driver union-find
    val prop = ids(Dedup.dedupNear(docs, "doc_id", "text",
      driverClusterMaxEdges = 0))
    val star = ids(Dedup.dedupNear(docs, "doc_id", "text",
      starClustering = true, driverClusterMaxEdges = 0))
    val local = ids(Dedup.dedupNear(docs, "doc_id", "text"))
    assert(prop === star)
    assert(local === prop)
    assert(prop.size < docs.count(), "fixture has planted dups to remove")
  }

  test("minHashTopK surfaces every high-similarity neighbor the exact search finds") {
    val docs = Lake(spark, sf0001).documents
    val queries = docs.where(col("doc_id") < 100)
    val corpus = docs.where(col("doc_id") >= 100)
    def high(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.where(col("jaccard") >= 0.9).select("query_id", "corpus_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = high(Dedup.jaccardTopK(corpus, queries, "doc_id", "text", 3, 5))
    val ann = high(Dedup.minHashTopK(corpus, queries, "doc_id", "text", 3, 64, 16, 5))
    // at 16x4 banding a j>=0.9 pair misses with (1-0.9^4)^16 ~ 4e-8
    assert(exact.nonEmpty, "fixture should contain cross-split high-sim pairs")
    assert(ann === exact)
  }

  test("incremental dedup keeps the existing corpus canonical") {
    import spark.implicits._
    val existing = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val incoming = Seq(
      (3L, "alpha beta gamma delta"),  // dup of existing -> drops despite smaller id
      (5L, "epsilon zeta eta theta"),  // new content -> survives
      (7L, "epsilon zeta eta theta"),  // dup of surviving incoming 5 -> drops
      (9L, "unique iota kappa lambda words")).toDF("doc_id", "text")
    val got = Dedup.dedupNearIncremental(existing, incoming, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(5L, 9L))
    // contrast: plain dedupNear over the union crowns the smaller id and
    // would DROP existing doc 10 - the rule incremental mode exists to avoid
    val union = existing.unionByName(incoming)
    val plain = Dedup.dedupNear(union, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!plain.contains(10L) && plain.contains(3L))
  }

  test("jaccardPairs df-cutoff drops boilerplate-only candidates, keeps real dups") {
    import spark.implicits._
    // 40 docs sharing one boilerplate shingle; docs 0/1 are identical
    val docs = (0 until 40).map { i =>
      val tail = if (i <= 1) "planted duplicate body text here"
      else s"unique$i body$i text$i words$i extra$i"
      (i.toLong, s"the quick brown $tail")
    }.toDF("doc_id", "text")
    // MaxValue = explicit exact mode; the finite default (1000) equals it
    // whenever no shingle df exceeds the cutoff (max df here is 40)
    val exact = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5,
      maxShingleDf = Int.MaxValue))
    val default = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5))
    val cutoff1000 = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5,
      maxShingleDf = 1000))
    assert(default === exact)
    assert(default === cutoff1000)
    // with the hot shingles dropped, docs sharing ONLY boilerplate never
    // even become candidates (threshold 0 exposes the candidate set)...
    val candidates = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.0,
      maxShingleDf = 10))
    assert(candidates === Set((0L, 1L)),
      s"only the planted dup should survive the df cutoff, got $candidates")
    // ...while without the cutoff every boilerplate pair is a candidate
    val noCutoff = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.0))
    assert(noCutoff.size === 40 * 39 / 2)
    // and the planted pair keeps jaccard 1.0 over the filtered universe
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, maxShingleDf = 10)
      .where(col("id_a") === 0 && col("id_b") === 1)
      .select("jaccard").head().getDouble(0)
    assert(j === 1.0)
  }

  test("banded simHashPairs equals brute-force Hamming pairs (pigeonhole at maxHamming=6)") {
    val docs = Lake(spark, sf0001).documents
    for ((numBits, hashFn) <- Seq(
        60 -> Dedup.md5Hash60,
        64 -> ((c: org.apache.spark.sql.Column) => xxhash64(c)))) {
      val sig = Dedup.simHash(docs, "doc_id", "text", numBits, hashFn).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val brute = (for {
        a <- sig.keys; b <- sig.keys if a < b
        if java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 6
      } yield (a, b)).toSet
      val banded = pairs(Dedup.simHashPairs(docs, "doc_id", "text",
        maxHamming = 6, numBits = numBits, tokenHash = hashFn))
      assert(banded === brute,
        s"numBits=$numBits: banded join must be exact, " +
          s"missing ${(brute diff banded).size}, extra ${(banded diff brute).size}")
      assert(brute.nonEmpty, s"numBits=$numBits: fixture should produce pairs")
    }
  }

  test("simHashPairs maxHamming=0 single 64-bit chunk buckets by full hash") {
    // w=64 chunk: (1L<<64)-1 wraps to 0 under JVM shift semantics — the
    // mask must be -1L or every doc collapses into one bucket (silent
    // cross product). Observable: pairs == exact-equal-simhash pairs.
    val docs = Lake(spark, sf0001).documents
    val sig = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for { a <- sig.keys; b <- sig.keys if a < b && sig(a) == sig(b) }
      yield (a, b)).toSet
    val got = pairs(Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 0))
    assert(got === want)
  }

  test("simhash is deterministic and separates near-dups from unrelated docs") {
    val docs = Lake(spark, sf0001).documents
    val h1 = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 === h2)
    // near-dup pairs (exact jaccard >= 0.8) should sit at low Hamming
    val near = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(h1(a) ^ h1(b))
    val nearHam = near.toSeq.map { case (a, b) => ham(a, b) }
    assert(nearHam.nonEmpty && nearHam.max <= 10,
      s"planted near-dups should have small simhash distance, got ${nearHam.max}")
  }

  test("decontaminate flags exactly the train docs sharing a benchmark 5-gram") {
    import spark.implicits._
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // 1st 5-gram sits in benchmark
      (2L, "one two three four five six seven"),   // disjoint vocabulary
      (4L, "short doc")                            // < 5 tokens -> zero shingles
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (3L, "totally different benchmark text entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, bench, "doc_id", "text", shingleN = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === Seq((0L, 1L, true), (2L, 0L, false), (4L, 0L, false)))
  }

  test("dedupChunks keeps first occurrence corpus-wide and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h"), // both chunks are first occurrences
      (1L, "a b c d x y z w"), // first chunk repeats doc 0's
      (2L, "e f g h a b c d"), // every chunk seen earlier -> empty doc
      (3L, "p q r s p q r s"), // within-doc repeat: second copy drops
      (4L, "t u v")            // short tail chunk survives as-is
    ).toDF("doc_id", "text")
    val got = Dedup.dedupChunks(docs, "doc_id", "text", chunkTokens = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (0L, "a b c d e f g h", 2L, 2L),
      (1L, "x y z w", 2L, 1L),
      (2L, "", 2L, 0L),
      (3L, "p q r s", 2L, 1L),
      (4L, "t u v", 1L, 1L)))
  }

  test("removeBoilerplateSpans drops exactly the tokens hot spans cover") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon unique0 tail0"), // hot span at 0
      (1L, "pre1 alpha beta gamma delta epsilon tail1"),    // hot span at 1
      (2L, "alpha beta gamma delta epsilon"),               // fully covered
      (3L, "totally different words entirely here")         // df=1 spans only
    ).toDF("doc_id", "text")
    val got = Dedup.removeBoilerplateSpans(docs, "doc_id", "text",
        shingleN = 5, minDocFreq = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (0L, "unique0 tail0", 5L),
      (1L, "pre1 tail1", 5L),
      (2L, "", 5L),
      (3L, "totally different words entirely here", 0L)))
  }
}
