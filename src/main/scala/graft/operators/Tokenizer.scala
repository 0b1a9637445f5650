package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer INDUCTION over a document corpus — the
  * "train the tokenizer" step of a training-data pipeline, as a native
  * Spark operator.
  *
  * Scale design (the part that matters at 100 TB): BPE never iterates
  * over the corpus. The corpus is read ONCE into a word-frequency table
  * (|vocab| rows — millions, not billions; the aggregation is a plain
  * map-side-combining groupBy), and every merge round runs over that
  * table's exploded symbol form (|vocab| · avg word length rows). Per
  * round the driver receives exactly ONE row — the argmax pair — because
  * the next round's plan depends on it; everything else stays
  * distributed. State is `localCheckpoint`ed per round so lineage stays
  * O(1) across rounds (the Graph.pageRank discipline).
  *
  * Greedy left-to-right merge application is implemented RELATIONALLY,
  * not as a per-word sequential fold: two matches of pair (l, r) can
  * only overlap when l == r (they would have to share a symbol that is
  * simultaneously an `l` and an `r`), i.e. inside runs of one repeated
  * symbol. So "greedy non-overlapping" is exactly: group consecutive
  * match positions into islands (gaps-and-islands over the match set)
  * and keep the even offsets within each island. That form is pure
  * window algebra — partitioned by word, never global — and is mirrored
  * verbatim by the DuckDB oracle, making the whole training loop
  * hash-exact testable.
  *
  * Tie-breaks are total and engine-portable: pair count descending, then
  * (lhs, rhs) ascending — binary string order on the lowercase-ASCII
  * alphabet the word regex admits. If the pair supply is exhausted
  * before `nMerges` rounds (tiny corpora), the round contributes no
  * merge and the state passes through unchanged — the oracle's empty
  * 1-row CTE composes the same way.
  */
object Tokenizer {

  /** Learn `nMerges` BPE merges from `textCol`. Words are maximal
    * `[a-z]+` runs of the lowercased text; symbols start as single
    * characters. Returns (merge_rank, lhs, rhs, pair_count), one row
    * per learned merge, ordered by rank.
    */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

    // exploded symbol state: (word, freq, pos, sym), pos 1-based
    var state = words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .withColumn("sym", expr("substr(word, pos, 1)"))
      .localCheckpoint(true)

    val byWord = Window.partitionBy("word").orderBy("pos")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]

    for (k <- 1 to nMerges) {
      val withNext = state.withColumn("nsym", lead(col("sym"), 1).over(byWord))
      // the one driver-side row this round: the argmax pair
      val best = withNext.where(col("nsym").isNotNull)
        .groupBy(col("sym").as("l"), col("nsym").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((k, l, r, cnt))
        // match set -> islands of consecutive positions -> keep even offsets
        val m = withNext.where(col("sym") === l && col("nsym") === r)
          .select(col("word"), col("pos"))
        val kept = m
          .withColumn("g", col("pos") - row_number().over(byWord))
          .withColumn("g0", min(col("pos"))
            .over(Window.partitionBy("word", "g")))
          .where((col("pos") - col("g0")) % 2 === 0)
          .select(col("word"), col("pos"), lit(true).as("is_k"))
        // rebuild: merged start keeps concat, the absorbed right side drops
        state = withNext
          .join(kept, Seq("word", "pos"), "left")
          .join(kept.select(col("word"), (col("pos") + 1).as("pos"),
            col("is_k").as("is_prev")), Seq("word", "pos"), "left")
          .where(col("is_prev").isNull)
          .select(col("word"), col("freq"), col("pos"),
            when(col("is_k"), concat(col("sym"), col("nsym")))
              .otherwise(col("sym")).as("sym"))
          .withColumn("pos", row_number().over(byWord))
          .localCheckpoint(true)
      }
    }

    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toSeq.map(m => Row(m._1, m._2, m._3, m._4)), 1),
      schema).orderBy("merge_rank")
  }

  /** Segment words with an ALREADY-LEARNED merge list (the tokenize
    * step): replay merges in rank order over the exploded symbol state.
    * `merges` is a bounded driver-side parameter (the model), so no
    * round collects anything. Returns (word, pos, sym) — the BPE symbol
    * sequence per distinct word, 1-based positions.
    */
  def bpeSegment(words: DataFrame, wordCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val byWord = Window.partitionBy("word").orderBy("pos")
    var state = words.select(col(wordCol).as("word")).distinct()
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .withColumn("sym", expr("substr(word, pos, 1)"))
    for ((l, r) <- merges) {
      val withNext = state.withColumn("nsym", lead(col("sym"), 1).over(byWord))
      val kept = withNext
        .where(col("sym") === l && col("nsym") === r)
        .select(col("word"), col("pos"))
        .withColumn("g", col("pos") - row_number().over(byWord))
        .withColumn("g0", min(col("pos")).over(Window.partitionBy("word", "g")))
        .where((col("pos") - col("g0")) % 2 === 0)
        .select(col("word"), col("pos"), lit(true).as("is_k"))
      state = withNext
        .join(kept, Seq("word", "pos"), "left")
        .join(kept.select(col("word"), (col("pos") + 1).as("pos"),
          col("is_k").as("is_prev")), Seq("word", "pos"), "left")
        .where(col("is_prev").isNull)
        .select(col("word"), col("pos"),
          when(col("is_k"), concat(col("sym"), col("nsym")))
            .otherwise(col("sym")).as("sym"))
        .withColumn("pos", row_number().over(byWord))
        // same lineage-truncation discipline as bpeTrain: without it the
        // per-round window+join stack compounds into an
        // exponentially-growing plan the optimizer chokes on
        .localCheckpoint(true)
    }
    state.select(col("word"), col("pos"), col("sym"))
  }
}
