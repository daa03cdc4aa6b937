package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")

  /** Events with `ts` normalized to an epoch-NANOSECOND BIGINT — the
    * one representation every downstream query (and each DuckDB oracle
    * via `epoch_ns(ts)`) assumes. The driver has shipped the column as
    * both parquet TIMESTAMP(NANOS) (reads as a raw ns long under
    * `nanosAsLong`) and TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ);
    * dispatch on the loaded type so either layout — and a replica
    * written from either — yields identical numbers. The NTZ/NANOS
    * branches use pure wall-clock arithmetic (`timestampdiff` against
    * an NTZ epoch literal), so the value does not depend on the
    * session time zone.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) under nanosAsLong: already ns
      case TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
          * lit(1000L))
      case TimestampType => df.withColumn("ts",
        unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other")
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
