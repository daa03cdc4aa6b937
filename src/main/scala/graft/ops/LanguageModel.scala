package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * perplexity filter (Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data"): score every document by
  * its average token-transition log-probability under a model trained
  * on the corpus itself, so documents whose token statistics diverge
  * from the corpus norm (boilerplate, gibberish, wrong-language
  * fragments) surface at the low end without any external model
  * artifact. Production pipelines swap the corpus-trained counts for a
  * reference-corpus LM; the plan shape is identical.
  *
  * Model: add-k smoothed bigram LM.
  *   P(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)
  * with V the corpus unigram vocabulary size. Scoring the training
  * corpus itself means every document bigram exists in the count
  * table, but the joins stay LEFT-free (inner is safe) only for that
  * reason; the smoothing constant still shapes scores and keeps the
  * formula total.
  *
  * Scale shape: tokenization/explode is linear in corpus bytes; the
  * unigram and bigram count tables are map-side-combinable
  * aggregations (bounded by vocabulary², not corpus size); scoring is
  * two equi-joins of the linear bigram stream against those count
  * tables (AQE broadcasts them when the vocabulary is small) and one
  * map-side-combinable per-document average. No driver-side state —
  * the vocabulary size joins in as a 1-row broadcast aggregate. The
  * same plan holds at 100 TB: nothing materializes more than
  * O(corpus tokens) rows, and the only shuffles are on token hash
  * keys.
  *
  * Float discipline: counts, V, and k are exact in any engine; the
  * (cb + k)/(c1 + k·V) division is IEEE-correctly-rounded; only
  * log() (≤1 ulp, library-specific) and the per-document summation
  * order carry engine noise, so the average is rounded to 4 dp —
  * the same convention as the centroid-cosine operators.
  *
  * Output: (id, n_bigrams, avg_logp) — one row per input document;
  * documents with fewer than two tokens keep n_bigrams = 0 and a NULL
  * score. Perplexity is exp(-avg_logp), monotone in the score, so the
  * filter threshold can be stated either way.
  */
object LanguageModel {

  /** Whitespace tokens with empties dropped (leading/trailing/double
    * spaces), the same convention as TextAnalysis token counting. */
  private def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def bigramLogProb(df: DataFrame, textCol: String, idCol: String,
      k: Double = 0.5): DataFrame =
    bigramLogProbFrom(
      df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts")), k)

  /** [[bigramLogProb]] over an ALREADY-TOKENIZED base frame
    * `(id, ts)` (ts = whitespace tokens, empties dropped) — the entry
    * point multi-tier consumers (Curation.qualityEnsemble) feed from
    * one materialized token frame instead of re-deriving the corpus
    * scan + split per tier.
    */
  def bigramLogProbFrom(base: DataFrame, k: Double = 0.5): DataFrame = {
    require(k > 0, "smoothing constant k must be positive")
    // adjacent pairs: element i of slice(ts,1,n-1) pairs with ts[i+2]
    // (transform's lambda index is 0-based, element_at is 1-based);
    // greatest(n-1, 0) keeps slice total on 0/1-token documents
    val docBi = base
      .select(col("id"), explode(expr(
        "transform(slice(ts, 1, greatest(size(ts) - 1, 0)), " +
          "(w, i) -> named_struct('w1', w, 'w2', element_at(ts, i + 2)))"))
        .as("b"))
      .select(col("id"), col("b.w1"), col("b.w2"))
    val uniCounts = base.select(explode(col("ts")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val biCounts = docBi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
    val vocab = uniCounts.agg(count(lit(1)).cast("double").as("v_size"))
    val scored = docBi
      .join(biCounts, Seq("w1", "w2"))
      .join(uniCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((col("cb") + lit(k)) / (col("c1") + lit(k) * col("v_size"))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 4).as("avg_logp"))
    base.select(col("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logp"))
  }

  /** CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
    * §4.3): tertile thresholds are TRAINED CONSTANTS from a bounded
    * deterministic sample of LM scores, then every document is
    * bucketed by comparing its score against the two literals — the
    * production shape, where thresholds come from a one-off sample job
    * and the corpus-wide pass is a pure projection (no global sort, no
    * corpus-sized window; a `ntile` over the full corpus would range-
    * shuffle 100 TB to rank documents whose bucket only needs two
    * comparisons).
    *
    * Sample discipline matches the ANN trainers: deterministic md5
    * bucket (`sampleBp` of 10000) then ordered-prefix limit
    * `maxSample`, so the trained thresholds are engine-independent.
    * Thresholds are DISCRETE order statistics (ascending ranks
    * floor(n/3)+1 and floor(2n/3)+1 — the first element of each upper
    * tertile, so an evenly divisible sample splits exactly in thirds)
    * over 4-dp-rounded scores — no interpolation, so the oracle's
    * row_number mirror lands on bit-identical values. Higher avg_logp = lower perplexity: the top
    * tertile is `head`. Unscorable docs (< 2 tokens) bucket as
    * `unscored`.
    *
    * Output: (id, n_bigrams, avg_logp, bucket) — one row per document.
    */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
      k: Double = 0.5, sampleSeed: String = "ppl", sampleBp: Int = 2000,
      maxSample: Int = 10000): DataFrame =
    perplexityBucketsFrom(
      df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts")),
      k, sampleSeed, sampleBp, maxSample)

  /** [[perplexityBuckets]] over an already-tokenized `(id, ts)` frame
    * — see [[bigramLogProbFrom]]. */
  def perplexityBucketsFrom(base: DataFrame, k: Double = 0.5,
      sampleSeed: String = "ppl", sampleBp: Int = 2000,
      maxSample: Int = 10000): DataFrame = {
    // the LM scoring feeds both the threshold sample and the output —
    // materialize once (reference-tracked blocks, as in simhashPairs)
    val scored = bigramLogProbFrom(base, k).localCheckpoint()
    val sample = scored
      .where(col("avg_logp").isNotNull &&
        Curation.hashBucket(col("id"), sampleSeed) < lit(sampleBp))
      .orderBy(col("id")).limit(maxSample)
      .select(col("avg_logp")).collect().map(_.getDouble(0)).sorted
    require(sample.nonEmpty, "perplexityBuckets needs at least one scorable doc")
    val n = sample.length
    val t1 = sample(n / 3)       // rank floor(n/3)+1, 0-indexed
    val t2 = sample(2 * n / 3)   // rank floor(2n/3)+1
    scored.withColumn("bucket",
      when(col("avg_logp").isNull, lit("unscored"))
        .when(col("avg_logp") >= lit(t2), lit("head"))
        .when(col("avg_logp") >= lit(t1), lit("middle"))
        .otherwise(lit("tail")))
  }
}
