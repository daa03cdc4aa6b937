package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained linear text classifier — the "quality classifier"
  * tier of LLM data pipelines (the fasttext-style filter of the GPT-3
  * / LLaMA data recipes: score every document with a cheap linear
  * model over token features, keep what scores positive). The model
  * here is multinomial Naive Bayes in log-odds form, trained
  * IN-PLAN on a boolean label column — no external model artifact, no
  * driver-side training loop, no UDF:
  *
  *   weight(w) = ln((c⁺(w) + k) / (T⁺ + k·V)) −
  *               ln((c⁻(w) + k) / (T⁻ + k·V))
  *   score(doc) = ln(N⁺/N⁻) + Σ_{w ∈ doc} weight(w)
  *
  * with c±(w) the token counts per class, T± the class token totals,
  * V the vocabulary size, N± the class document counts, and k the
  * add-k smoothing constant. score > 0 ⇔ the model prefers the
  * positive class.
  *
  * Scale shape: one token explode (linear in corpus bytes), one
  * map-side-combinable token-count aggregation (bounded by |vocab|,
  * not corpus size), class/document totals as 1-row broadcast
  * aggregates, then scoring joins the linear token stream against the
  * vocab-sized weight table (AQE broadcasts it) and reduces per doc —
  * exactly the LanguageModel.bigramLogProb plan shape. At 100 TB
  * nothing materializes beyond O(corpus tokens) rows and the only
  * shuffles key on token hash and doc id.
  *
  * Float discipline: counts and totals are exact integers in any
  * engine; ln carries ≤1 ulp and the per-doc summation order is
  * engine-specific, so the score is rounded to 4 dp and the
  * prediction derives from the ROUNDED score (the same convention as
  * bigramLogProb) — the oracle compares bit-identical values.
  *
  * Output: (id, n_tokens, log_odds, pred_pos) — one row per input
  * document; a token-less document scores the prior alone.
  */
object Classifier {

  /** Whitespace tokens with empties dropped — the shared corpus
    * tokenization convention (TextAnalysis / LanguageModel). */
  private def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def logOddsScore(df: DataFrame, textCol: String, idCol: String,
      positive: Column, k: Double = 1.0): DataFrame =
    logOddsScoreFrom(
      df.select(col(idCol).as("id"), positive.as("pos"),
        tokens(col(textCol)).as("ts")), k)

  /** [[logOddsScore]] over an ALREADY-TOKENIZED base frame
    * `(id, pos, ts)` (ts = whitespace tokens, empties dropped) — the
    * entry point multi-tier consumers (Curation.qualityEnsemble) feed
    * from one materialized token frame instead of re-deriving the
    * corpus scan + split per tier.
    */
  def logOddsScoreFrom(base: DataFrame, k: Double = 1.0): DataFrame = {
    require(k > 0, "smoothing constant k must be positive")
    val toks = base.select(col("id"), col("pos"), explode(col("ts")).as("w"))
    val cw = toks.groupBy(col("w"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("cneg"))
    val totals = cw.agg(sum(col("cpos")).cast("double").as("tpos"),
      sum(col("cneg")).cast("double").as("tneg"),
      count(lit(1)).cast("double").as("v_size"))
    val prior = base.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).cast("double").as("npos"),
      sum(when(!col("pos"), 1L).otherwise(0L)).cast("double").as("nneg"))
    val weights = cw.crossJoin(broadcast(totals))
      .select(col("w"),
        (log((col("cpos") + lit(k)) / (col("tpos") + lit(k) * col("v_size"))) -
          log((col("cneg") + lit(k)) / (col("tneg") + lit(k) * col("v_size"))))
          .as("weight"))
    val docScores = toks.join(weights, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("weight")).as("w_sum"))
    base.select(col("id")).join(docScores, Seq("id"), "left")
      .crossJoin(broadcast(prior))
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(log(col("npos") / col("nneg")) + coalesce(col("w_sum"), lit(0.0)), 4)
          .as("log_odds"))
      .withColumn("pred_pos", col("log_odds") > lit(0.0))
  }
}
