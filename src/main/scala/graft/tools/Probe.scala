package graft.tools

import org.apache.spark.sql.SparkSession

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
    val d = "/root/testdata/sf0.001"
    try {
      val ev = spark.read.parquet(s"$d/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch {
      case e: Throwable => println(s"PLAIN READ FAILED: ${e.getMessage}")
    }
    try {
      val ev2 = spark.sessionState.conf // just to force init
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev3 = spark.read.parquet(s"$d/events.parquet")
      ev3.printSchema()
      ev3.show(3, truncate = false)
    } catch {
      case e: Throwable => println(s"NANOS-AS-LONG READ FAILED: ${e.getMessage}")
    }
    spark.stop()
  }
}
