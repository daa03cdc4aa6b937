package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan evidence for the r19 streaming state-store tuning:
  * runs the stream_interval_join_left streaming query against the
  * sf store and prints the EXECUTED micro-batch plan (explain of the
  * running query — the only place the streaming join's state format
  * and store provider are visible) plus the session's state-store
  * confs. Run with SPARK_GRAFT_STATE_STORE=hdfs for the "before"
  * shape (default HDFSBackedStateStoreProvider, join format v2) and
  * unset for the shipped "after" (RocksDB + changelog + format v3).
  * Usage: runMain graft.tools.PlanStreamState
  */
object PlanStreamState {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val es = graft.StoreProvider.storeFor(spark, sf)
    graft.SparkEntry.tuneStateStore(spark)
    def feed() = spark.readStream
      .schema(graft.core.EventSchema.schema)
      .option("basePath", s"${es.root}/events")
      .parquet(s"${es.root}/events")
    val ck = java.nio.file.Files.createTempDirectory("plan-sij-")
    val q = graft.streaming.EventTimeAggs
      .intervalJoinLeft(feed(), feed(), "click", "purchase",
        reach = "1 hour", lateness = "45 days")
      .writeStream
      .option("checkpointLocation", ck.toString)
      .format("noop").start()
    try {
      q.processAllAvailable()
      Seq("spark.sql.streaming.stateStore.providerClass",
        "spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled",
        "spark.sql.streaming.join.stateFormatVersion").foreach { k =>
        println(s"$k = ${spark.conf.getOption(k).getOrElse("<default>")}")
      }
      println(q.explain())
    } finally {
      q.stop()
      graft.core.Fs.deleteRecursively(ck.toFile)
    }
    spark.stop()
  }
}
