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
  * `exact = false` swaps in `approx_count_distinct` (HLL — the
  * bounded-sketch form a 100 TB profile actually runs, same shape as
  * graft.ops.Sketches). min/max are cast to strings so one schema
  * profiles any column mix; string ordering is binary UTF-8 in both
  * engines.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no column $c"))
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    cols.map(c => one.select(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value")))
      .reduce(_ unionAll _)
  }
}
