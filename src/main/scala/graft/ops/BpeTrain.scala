package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units") — the other half of the tokenizer
  * story next to `TextAnalysis.bpeTokenCount` (which only counts
  * pre-tokenizer matches): learn the merge table itself from the
  * corpus.
  *
  * Scale split: the ONLY corpus-scale pass is `wordCounts` — one
  * map-side-combinable aggregation collapsing the corpus to its
  * vocabulary (|vocab| rows ≪ corpus rows; at 100 TB the vocabulary is
  * millions of rows, still a small DataFrame). Every merge iteration
  * after that runs on the vocabulary table only: one adjacent-pair
  * count aggregation (weighted by word frequency — counting each
  * DISTINCT word once and weighting is exactly equivalent to counting
  * the raw corpus, which is why BPE trainers all run on the frequency
  * table) and one map over the symbol sequences. The per-iteration
  * argmax ships ONE row to the driver (the winning pair) — bounded,
  * like the k-means/PQ trained constants.
  *
  * Determinism: ties on pair count break by (a, b) ascending, so the
  * merge sequence is a pure function of the corpus on any engine.
  */
object BpeTrain {

  /** Corpus → word frequency table: (word, c). The one corpus-scale
    * pass; everything downstream is O(|vocab|).
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(col(textCol), " "), t => t =!= ""))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))

  /** Adjacent symbol-pair counts over a (syms: array<string>, c: long)
    * vocabulary, weighted by word frequency: (a, b, cnt). One explode
    * (≤ Σ word lengths rows) into a map-side-combinable aggregation.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("syms")) > 1)
      .select(col("c"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> named_struct('a', syms[i-1], 'b', syms[i]))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("c")).as("cnt"))

  /** Word → initial single-character symbol array. `split` on the
    * empty pattern keeps a trailing "" (Java split with limit -1) —
    * dropped here, or the empty symbol would join the pair statistics.
    */
  def charSyms(word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(word, ""), s => s =!= "")

  /** One word's symbols with its corpus frequency — the unit the merge
    * loop iterates over. */
  final case class SymWord(syms: Seq[String], c: Long)

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge
    * table in application order. Each iteration: pair-count the
    * vocabulary, take the (count desc, pair asc) argmax, merge leftmost
    * non-overlapping occurrences in every word's symbol sequence (a
    * typed map over |vocab| rows — not the corpus). `localCheckpoint`
    * cuts the per-iteration lineage the same way the
    * connected-components loop does.
    */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int)
      : Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = wordCounts(df, textCol)
      .select(charSyms(col("word")).as("syms"), col("c"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(desc("cnt"), col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is a single symbol
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += ((a, b))
        vocab = vocab.as[SymWord].map { w =>
          val out = ArrayBuffer.empty[String]
          var i = 0
          while (i < w.syms.length) {
            if (i + 1 < w.syms.length && w.syms(i) == a && w.syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += w.syms(i); i += 1 }
          }
          SymWord(out.toSeq, w.c)
        }.toDF("syms", "c").localCheckpoint()
      }
    }
    merges.toSeq
  }
}
