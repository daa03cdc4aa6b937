package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for probing Spark behavior on the testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("probe-es-").toString
    val es = graft.api.EventStore.open(spark, dir, 8)
    val df = (0 until 1000)
      .map(i => (s"user-${i % 37}", "Evt", i.toLong))
      .toDF("stream_id", "event_name", "arrival")
    val n = es.ingest(df, "arrival")
    println(s"INGESTED n=$n")
    println(s"WATERMARKS=${es.manifest.watermarks.toSeq.sorted}")
    val all = es.events()
    println(s"COUNT=${all.count()}")
    all.groupBy($"partition_id").count().orderBy($"partition_id").show()
    spark.stop()
  }
}
