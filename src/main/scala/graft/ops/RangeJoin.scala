package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match points to the intervals containing
  * them. Spark's built-in plan for `p >= lo AND p < hi` join conditions
  * is BroadcastNestedLoopJoin (or worse, a cartesian product) — every
  * point tested against every interval. This operator uses the standard
  * bucketization rewrite instead: intervals explode into the fixed-
  * width buckets they cover, points map to their single bucket, and the
  * match becomes an EQUI-join on bucket id plus a residual predicate.
  *
  * Scale shape: shuffle keys are bucket ids, so cost is
  * |points| + Σ(interval_length / bucketWidth) — linear, never
  * |points| × |intervals|. Pick `bucketWidth` near the median interval
  * length: wider buckets mean fewer interval replicas but more residual
  * filtering; both are bounded at 100 TB because neither side ever
  * materializes a cross product.
  */
object RangeJoin {

  /** Inner point-in-interval join on integral columns: one output row
    * per (point row, interval row) with `lo <= point < hi`. Both sides
    * keep all their columns; `bucketWidth` must be positive.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    def bucketOf(c: Column) = call_function("div", c.cast("long"), w)
    // an interval [lo, hi) covers buckets floor(lo/w) .. floor((hi-1)/w)
    // — empty intervals (hi <= lo) cover nothing and join nothing
    val iv = intervals.withColumn("__bucket", explode(
      when(col(hiCol) > col(loCol),
        sequence(bucketOf(col(loCol)), bucketOf(col(hiCol) - 1)))
        .otherwise(array().cast("array<bigint>"))))
    points.withColumn("__bucket", bucketOf(col(pointCol)))
      .join(iv, "__bucket")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
