package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality pass a pipeline runs before and
  * after every transformation (row/null/distinct counts, value
  * ranges): ONE aggregation pass over the table producing a single
  * row of per-column statistics, melted to long form
  * (column, n_rows, n_nulls, n_distinct, min_value, max_value).
  *
  * Scale shape: nulls/min/max are map-side-combinable; the distinct
  * counts are the only expensive part — `exact = true` uses
  * `count(DISTINCT col)` (Spark plans one Expand projection per
  * profiled column; right for the oracle-gated correctness pass),
  * `exact = false` swaps in `approx_count_distinct` (HLL at relative
  * error `rsd` — the bounded-sketch form a 100 TB profile actually
  * runs, same shape as graft.ops.Sketches; gated end-to-end by
  * `profile_documents_approx`, which pins the sketch within tolerance
  * of the exact counts). min/max are cast to strings so one schema
  * profiles any column mix; string ordering is binary UTF-8 in both
  * engines.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no column $c"))
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // melt the single agg row through ONE generator projection (stack)
    // so the scan+aggregate subtree is planned — and computed — exactly
    // once; a per-column unionAll of selects re-plans the same agg per
    // branch and only exchange reuse MAY dedupe it
    val groups = cols.flatMap(c => Seq(lit(c),
      col(s"${c}__nulls"), col(s"${c}__distinct"),
      col(s"${c}__min"), col(s"${c}__max")))
    one.select(col("__n").as("n_rows"),
        stack((lit(cols.size) +: groups): _*)
          .as(Seq("column", "n_nulls", "n_distinct", "min_value", "max_value")))
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
