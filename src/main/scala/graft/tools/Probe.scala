package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for probing Spark behavior on the testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"

    def show(name: String): Unit = {
      println(s"==== $name ====")
      println(graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    show("q1_agg")
    show("q3_topk")
    show("escan_stream")

    // EGET through the store: is the directory partition pruned?
    val es = graft.StoreProvider.storeFor(spark, sfDir)
    val someId = es.events().select(col("event_id")).limit(1).collect()(0).getString(0)
    val getPlan = es.get(java.util.UUID.fromString(someId))
    println("==== es.get (EGET) ====")
    println(getPlan.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
