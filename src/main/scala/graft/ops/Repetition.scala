package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for pretraining corpora, after the
  * public Gopher filtering rules (Rae et al. 2021, "Scaling Language
  * Models: ...", §A1.1): documents dominated by a few repeated n-grams
  * are boilerplate/spam and get filtered before training.
  *
  * Two signals per document:
  *   - `top_bigram_frac` — fraction of the document's characters
  *     covered by occurrences of its single most frequent word 2-gram.
  *   - `dup_trigram_frac` — fraction of word 3-gram occurrences that
  *     are duplicates (i.e. their gram appears more than once).
  *
  * Shape at scale: explode to (doc, gram) → count (map-side combine on
  * the compound key, one shuffle) → per-doc top-1 via window / ratio
  * agg. No all-pairs anywhere; linear in corpus size, parallel over
  * (doc, gram) buckets. The per-doc window partitions by doc id, so no
  * single-partition global sort exists in the plan.
  */
object Repetition {

  /** Word n-grams from a MATERIALIZED token-array column as an array:
    * gram i = toks[i..i+n-1] joined by one space, i = 0..count-n.
    * Empty array when the text has fewer than n tokens (guarded — an
    * unguarded descending `sequence` would throw, not truncate).
    *
    * `toks` must be a plain column reference (e.g. a projected
    * `split(text, " ")`), NOT an inline expression: Spark performs no
    * common-subexpression elimination inside higher-order-function
    * lambdas, so an inline split would re-tokenize the whole document
    * once per gram — O(tokens²) per document, invisible on 100-token
    * test docs and fatal on web-length ones. Same pattern as
    * `Dedup.wordShingles`.
    */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Per-document repetition features over `textCol`:
    * (id, top_bigram, top_bigram_count, top_bigram_frac,
    * dup_trigram_frac). Ties on the top bigram count break on the
    * lexicographically smallest gram so the result is deterministic on
    * any engine.
    *
    * Every input document appears in the output: documents too short to
    * have bigrams (or trigrams) keep defaults top_bigram = "",
    * top_bigram_count = 0, fractions = 0.0 — a downstream quality
    * filter must see short documents, not lose them to an inner join.
    */
  def repetitionFeatures(df: DataFrame, textCol: String, idCol: String): DataFrame =
    repetitionFeaturesFrom(
      df.select(col(idCol), length(col(textCol)).as("n_chars"),
        split(col(textCol), " ").as("toks")),
      idCol)

  /** [[repetitionFeatures]] over an ALREADY-TOKENIZED base frame
    * `(idCol, n_chars, toks)` — the entry point multi-tier consumers
    * (Curation.qualityEnsemble) feed from ONE materialized token
    * frame instead of re-deriving the corpus scan + split per tier.
    * Tokenization stays once-per-document either way; the n-gram
    * lambdas below only index into the `toks` column.
    */
  def repetitionFeaturesFrom(base: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    val bigrams = base
      .select(id, col("n_chars"), explode(ngramsOfTokens(col("toks"), 2)).as("g"))
      .groupBy(id, col("n_chars"), col("g"))
      .agg(count(lit(1)).as("c"))
    val top = bigrams
      .withColumn("rn", row_number().over(
        Window.partitionBy(id).orderBy(col("c").desc, col("g"))))
      .where(col("rn") === 1)
      .select(id, col("n_chars"),
        col("g").as("top_bigram"), col("c").as("top_bigram_count"))
    val trigrams = base
      .select(id, explode(ngramsOfTokens(col("toks"), 3)).as("g"))
      .groupBy(id, col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(id)
      .agg((sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast("double") /
        sum(col("c")).cast("double")).as("dup_frac"))
    base.select(id)
      .join(top, Seq(idCol), "left")
      .join(trigrams, Seq(idCol), "left")
      .select(id,
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        coalesce(round(col("top_bigram_count").cast("double") *
          length(col("top_bigram")).cast("double") /
          col("n_chars").cast("double"), 6), lit(0.0)).as("top_bigram_frac"),
        coalesce(round(col("dup_frac"), 6), lit(0.0)).as("dup_trigram_frac"))
  }
}
