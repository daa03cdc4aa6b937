package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch: ingest scaling probe (1M events = 10x sf0.1). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val base = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val big = (0 until 10).map { i =>
      base.select(
        concat(lit("user-"), col("user_id")).as("stream_id"),
        col("event_type").as("event_name"),
        col("props").cast("binary").as("payload"),
        expr("ts div 1000000").as("timestamp_ms"),
        (col("event_id") + lit(i * 100000L)).as("arrival"))
    }.reduce(_ unionByName _)
    println(s"ROWS=${big.count()}")
    val dir = java.nio.file.Files.createTempDirectory("probe-1m-").toString
    val es = graft.api.EventStore.open(spark, dir, 32)
    val n = time("ingest-1M") { es.ingest(big, "arrival") }
    println(s"INGESTED=$n RATE=${(n / 1).toDouble} ev")
    time("scan-after") { es.scan("user-42", count = 100).events.count() }
    time("pscan-after") { es.pscan(0, count = 1000).events.count() }
    spark.stop()
  }
}
