package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the
  * greatest `rightTime <= leftTime` within the same key — the classic
  * time-series enrichment operator the reference (an event store)
  * leaves to the query layer.
  *
  * Spark-first composition (preference tier (a) — no custom physical
  * operator needed): union both sides tagged, ONE window pass per key
  * ordered by (time, side) carrying the last-seen right row forward,
  * then keep the left rows. Cost: one shuffle on the key + one sort —
  * the same as a sort-merge join, but with no row-multiplication and
  * no range-condition blowup, so it scales to 100 TB exactly like a
  * keyed window.
  *
  * Equal timestamps are inclusive (a right row AT the left time
  * matches), and right-side ties on (key, time) resolve to the largest
  * `rightOrder` value, deterministically.
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      rows providing the as-of value
    * @param key        equi-join column present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightOrder tie-break column on `right` (unique per
    *                   (key, time)), e.g. an event id
    * @param rightCols  right columns to carry (exposed as `asof_<col>`)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightOrder: String,
      rightCols: Seq[String]): DataFrame = {
    // dedupe right to one row per (key, time): greatest rightOrder wins
    val r1 = right.withColumn("__rn", row_number().over(
        Window.partitionBy(col(key), col(rightTime))
          .orderBy(col(rightOrder).desc)))
      .where(col("__rn") === 1)
      .drop("__rn")

    // carry the matched right row as ONE struct so its fields stay
    // atomic — carrying columns independently with ignoreNulls would
    // backfill a legitimate NULL field from an older right row
    val rightStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => r1.schema(c).copy(name = c)))
    val leftTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts after right at equal time
      .select(Seq(col(key), col("__t"), col("__side")) ++
        left.columns.filterNot(_ == key).map(col) :+
        lit(null).cast(rightStructType).as("__r"): _*)
    val rightTagged = r1
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        left.columns.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = leftTagged.unionByName(rightTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    rightCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__r.$c"))
    }.where(col("__side") === 1).drop("__t", "__side", "__r")
  }

  /** Forward as-of join with optional tolerance: for every left row,
    * the single right row with the SMALLEST `rightTime >= leftTime`
    * (inclusive) within the same key, nulled out when it lies more
    * than `tolerance` time units ahead — pandas merge_asof's
    * direction='forward' + tolerance, the "next event within a bound"
    * enrichment (e.g. click → next purchase within an hour).
    *
    * Same one-window composition as [[asofJoin]], mirrored: left rows
    * sort BEFORE right rows at equal time, and `first(..,ignoreNulls)`
    * over [current, +∞) carries the next right row backward. Ties on
    * (key, rightTime) resolve to the SMALLEST `rightOrder` (the next
    * event by id). One shuffle + one sort per key; tolerance is a pure
    * post-projection, so the scale shape is unchanged.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightOrder: String,
      rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val r1 = right.withColumn("__rn", row_number().over(
        Window.partitionBy(col(key), col(rightTime))
          .orderBy(col(rightOrder).asc)))
      .where(col("__rn") === 1)
      .drop("__rn")

    // the struct carries the matched right row's time (__rt) so the
    // tolerance check can run after the fill without a second join
    val rightStructType = org.apache.spark.sql.types.StructType(
      r1.schema(rightTime).copy(name = "__rt") +:
        rightCols.map(c => r1.schema(c).copy(name = c)))
    val leftTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0)) // left sorts BEFORE right at equal time
      .select(Seq(col(key), col("__t"), col("__side")) ++
        left.columns.filterNot(_ == key).map(col) :+
        lit(null).cast(rightStructType).as("__r"): _*)
    val rightTagged = r1
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        left.columns.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTime).as("__rt") +: rightCols.map(col): _*).as("__r"): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = leftTagged.unionByName(rightTagged)
      .withColumn("__r", first(col("__r"), ignoreNulls = true).over(w))
    val bounded = tolerance match {
      case Some(tol) => filled.withColumn("__r",
        when(col("__r").isNotNull && col("__r.__rt") - col("__t") <= tol, col("__r")))
      case None => filled
    }
    rightCols.foldLeft(bounded) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__r.$c"))
    }.where(col("__side") === 0).drop("__t", "__side", "__r")
  }
}
