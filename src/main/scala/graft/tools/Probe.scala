package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only scratch main for probing Spark behavior on the testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sfDir = "/root/testdata/sf0.1"
    val src = time("read-src") {
      val d = graft.Tables.events(spark, sfDir)
        .select(concat(lit("user-"), col("user_id")).as("stream_id"),
          col("event_type").as("event_name"),
          col("props").cast("binary").as("payload"),
          expr("ts div 1000000").as("timestamp_ms"),
          col("event_id").as("arrival"))
      d.count(); d
    }
    val np = 32
    val route = udf { sid: String =>
      val pk = graft.core.Ids.partitionKeyForStream(sid)
      val h = graft.core.Ids.partitionHash(pk)
      (pk.toString, h, h % np)
    }
    val base = src.withColumn("route", route($"stream_id"))
      .withColumn("partition_id", $"route._3").drop("route")
    time("route-count") { base.count() }
    val wp = Window.partitionBy($"partition_id").orderBy($"arrival")
    val ws = Window.partitionBy($"stream_id").orderBy($"arrival")
    val w1 = base.withColumn("ps", row_number().over(wp).cast("long") - 1)
    time("window-p") { w1.count() }
    val w2 = w1.withColumn("sv", row_number().over(ws).cast("long") - 1)
    time("window-ps") { w2.count() }
    val out = java.nio.file.Files.createTempDirectory("probe-w-").toString
    time("write-plain") { w2.repartition($"partition_id")
      .sortWithinPartitions($"ps")
      .write.mode("overwrite").partitionBy("partition_id").parquet(out + "/a") }
    time("write-zstd-bloom") { w2.repartition($"partition_id")
      .sortWithinPartitions($"ps")
      .write.mode("overwrite").partitionBy("partition_id")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#event_id", "true")
      .option("parquet.bloom.filter.enabled#stream_id", "true")
      .parquet(out + "/b") }
    val cached = w2.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cache-mat") { cached.count() }
    time("agg-wm") { cached.groupBy($"partition_id").agg(max($"ps")).collect() }
    time("agg-heads") { cached.groupBy($"stream_id").agg(max($"sv")).collect() }
    spark.stop()
  }
}
