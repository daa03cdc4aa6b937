package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch aggregations — the approximate operators a 100 TB profile
  * actually runs, where exact distinct counts or quantiles would
  * shuffle the full key set:
  *
  *   - `approx_count_distinct` (HyperLogLog++): fixed-size sketch per
  *     group, mergeable map-side, relative error ~rsd.
  *   - `percentile_approx` (Greenwald-Khanna-style): bounded-size
  *     quantile summary, mergeable, returns a REAL data element.
  *
  * Correctness-gating strategy: sketches are engine-specific, so an
  * external oracle cannot reproduce their internals. Instead the gated
  * query computes BOTH the exact statistic and a boolean "sketch within
  * tolerance of exact" flag; the oracle recomputes the exact side and
  * pins the flag to TRUE — if an engine's sketch ever drifts out of
  * tolerance, the flag flips and the hash mismatches. (At scale the
  * exact side is dropped and only the sketch runs; the gate exists to
  * prove the sketch's error contract on real data.)
  */
object Sketches {

  /** Per-key exact distinct + HLL gate: (key, n_exact, approx_ok). */
  def distinctGate(df: DataFrame, keyCol: String, valCol: String,
      rsd: Double = 0.02, tol: Double = 0.05): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        countDistinct(col(valCol)).as("n_exact"),
        approx_count_distinct(col(valCol), rsd).as("n_approx"))
      .select(col(keyCol), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") <=
          lit(tol) * col("n_exact").cast("double")).as("approx_ok"))

  /** Heavy-hitters gate: the exact top-k values by count, each flagged
    * as present in the single-pass bounded-memory frequent-items
    * sketch (Karp / Misra-Gries counting via `df.stat.freqItems`) at
    * `support`. The sketch holds O(1/support) counters per partition
    * and merges — the 100 TB shape for "top domains / top users /
    * top tokens" where an exact global count-and-sort would be the
    * whole job. Misra-Gries has NO false negatives above the support
    * threshold, so as long as the true top-k all clear `support`, the
    * flag is deterministically TRUE and the oracle pins it — a sketch
    * regression that loses a true heavy hitter flips the flag and
    * hash-mismatches. The sketch item list (≤ 1/support values)
    * is collected driver-side — bounded by construction.
    * Ties at the k boundary break on the value itself, so both
    * engines pick the same k rows.
    *
    * `above_support` makes the determinism PRECONDITION itself part of
    * the gated output: in_sketch=TRUE is only guaranteed while every
    * true top-k item's exact frequency clears `support` — on a corpus
    * where one slips under, the sketch flag would flip
    * nondeterministically with no signal about why. Emitting
    * `n > support·total` per item (an exact quantity the oracle pins
    * TRUE alongside in_sketch) turns that silent precondition breach
    * into a named red column.
    */
  def topKItemsGate(df: DataFrame, valCol: String, k: Int,
      support: Double): DataFrame = {
    val items: Seq[Any] = df.stat.freqItems(Seq(valCol), support)
      .head.getSeq[Any](0)
    val counts = df.groupBy(col(valCol))
      .agg(count(lit(1)).as("n"))
    // total via an unpartitioned window over the GROUPED counts: one
    // extra shuffle of the (vocab-bounded) distinct values, not a
    // third corpus pass
    counts
      .withColumn("__tot", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .orderBy(col("n").desc, col(valCol).asc)
      .limit(k)
      .select(col(valCol), col("n"),
        (if (items.isEmpty) lit(false)
         else col(valCol).isin(items: _*)).as("in_sketch"),
        (col("n").cast("double") > lit(support) * col("__tot").cast("double"))
          .as("above_support"))
  }

  /** Per-key exact median + sketch gate:
    * (key, p50_exact, p50_approx_ok). The approx flag tolerates
    * `tolFrac` of the key's exact (p95 - p5) spread — an
    * absolute-value-relative bound would be meaningless for medians
    * near zero.
    */
  def medianGate(df: DataFrame, keyCol: String, valCol: String,
      tolFrac: Double = 0.05): DataFrame = {
    val v = col(valCol)
    df.groupBy(col(keyCol))
      .agg(
        expr(s"percentile($valCol, 0.5)").as("p50e"),
        expr(s"percentile($valCol, 0.05)").as("p05"),
        expr(s"percentile($valCol, 0.95)").as("p95"),
        percentile_approx(v, lit(0.5), lit(1000)).as("p50a"))
      .select(col(keyCol),
        round(col("p50e"), 6).as("p50_exact"),
        (abs(col("p50a") - col("p50e")) <=
          lit(tolFrac) * (col("p95") - col("p05"))).as("p50_approx_ok"))
  }
}
