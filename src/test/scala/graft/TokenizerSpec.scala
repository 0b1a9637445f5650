package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Tokenizer

/** Laws for the BPE trainer (operators/Tokenizer): the relational
  * islands-and-parity construction must equal the textbook SERIAL
  * greedy algorithm — implemented here independently as a mutable
  * left-to-right scan — on corpora chosen to stress the overlap cases
  * (runs of one symbol, alternating pairs), and segmentation must be a
  * lossless refinement of the word. */
class TokenizerSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // -- independent reference implementation (serial, mutable) ------------
  private def applyMergeSerial(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def serialBpe(words: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    var st = words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- st; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), cn) => (-cn, a, b) }
        rank += 1
        acc += ((rank, l, r, c))
        st = st.map { case (syms, f) => (applyMergeSerial(syms, l, r), f) }
      }
    }
    acc.toSeq
  }

  private def trainOn(texts: Seq[String], n: Int) = {
    val docs = texts.toDF("text")
    Tokenizer.bpeTrain(docs, "text", n)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("bpeTrain equals the serial textbook algorithm on an overlap-heavy corpus") {
    // runs ("aaaa") and alternations ("abab") are exactly where a naive
    // all-matches merge diverges from greedy left-to-right
    val texts = Seq(
      "banana banana bandana cabana",
      "aaaa aaa abab ababab baaab",
      "low lower lowest newest newer wide wider widest")
    val got = trainOn(texts, 10)
    val want = serialBpe(wordFreqs(texts), 10)
    assert(got === want)
  }

  test("bpeTrain equals the serial algorithm on the sf0.001 documents") {
    val texts = Lake(spark, sf0001).documents
      .select("text").collect().map(_.getString(0)).toSeq
    val got = trainOn(texts, 8)
    val want = serialBpe(wordFreqs(texts), 8)
    assert(got === want)
  }

  test("pair-supply exhaustion stops cleanly short of nMerges") {
    // one word, 3 chars -> at most 2 merges ever
    val got = trainOn(Seq("abc"), 5)
    assert(got.map(_._1) === Seq(1, 2))
    assert(got === serialBpe(Map("abc" -> 1L), 5))
  }

  test("bpeTrain equals the serial algorithm on randomized corpora") {
    // tiny alphabet forces pair collisions, runs, and count ties — the
    // argmax tie-break and island-parity corners a fixed fixture misses
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val wordGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val docGen = Gen.choose(2, 6)
      .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, docGen))
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 4)) { (texts, n) =>
      trainOn(texts, n) == serialBpe(wordFreqs(texts), n)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"randomized BPE law: ${res.status}")
  }

  test("bpeSegment reconstructs every word and matches serial replay") {
    val texts = Seq("banana bandana", "aaaa abab")
    val merges = serialBpe(wordFreqs(texts), 6).map(m => (m._2, m._3))
    val words = wordFreqs(texts).keys.toSeq.toDF("word")
    val seg = Tokenizer.bpeSegment(words, "word", merges)
      .orderBy("word", "pos").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toVector).toMap
    wordFreqs(texts).keys.foreach { w =>
      val want = merges.foldLeft(w.map(_.toString).toVector) {
        case (syms, (l, r)) => applyMergeSerial(syms, l, r)
      }
      assert(seg(w) === want, s"segmentation of '$w'")
      assert(seg(w).mkString === w, s"lossless refinement of '$w'")
    }
  }
}
