package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Tables.events must yield the SAME epoch-ns BIGINT `ts` whatever
  * physical timestamp layout the driver's generator shipped that
  * round — round 9 regenerated events.parquet as TIMESTAMP(MICROS)
  * where every prior round used TIMESTAMP(NANOS), which silently
  * broke all 17 event queries at analysis time.
  */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    // deliberately NOT UTC: the ns value must not depend on session tz
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("events.ts normalizes to identical ns longs from micros and ntz layouts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables-spec-").toString
    val rows = Seq(
      (1L, java.time.LocalDateTime.of(2024, 3, 1, 12, 0, 0, 123456000)),
      (2L, java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0, 0)),
      (3L, java.time.LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000)))
    rows.toDF("event_id", "ts").write.parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.map { case (id, ldt) =>
      val epoch = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L +
        ldt.getNano
      id -> epoch
    }.toMap
    assert(got == want, s"ns values must be tz-independent wall-clock: $got")
    // driver-shaped reads keep working end-to-end: ts div 1000 is µs
    val us = Tables.events(spark, dir)
      .selectExpr("event_id", "ts div 1000 AS ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(us == want.map { case (k, v) => k -> v / 1000 })
    graft.core.Fs.deleteRecursively(new java.io.File(dir))
  }

  test("events.ts long (nanos-as-long) layout passes through untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables-spec-").toString
    Seq((1L, 1709294400123456789L), (2L, 0L))
      .toDF("event_id", "ts").write.parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1709294400123456789L, 2L -> 0L))
    graft.core.Fs.deleteRecursively(new java.io.File(dir))
  }
}
