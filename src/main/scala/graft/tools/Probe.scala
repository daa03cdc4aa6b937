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

    val dir = java.nio.file.Files.createTempDirectory("probe-sub-").toString
    val es = graft.api.EventStore.open(spark, dir, 8)
    def in(n: String) = graft.core.EventInput("live-stream", n, n.getBytes, Array.emptyByteArray)
    (1 to 3).foreach(i => es.append(in(s"history-$i")))

    import graft.streaming.Subscriptions._
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = deliver(
      subscribe(es, Matcher(streams = Seq("live-stream")), From.Value(0)),
      java.nio.file.Files.createTempDirectory("probe-ck-").toString,
      byStream = true) { rows =>
      rows.foreach(r => delivered.add(
        s"${r.getAs[Long]("stream_version")}:${r.getAs[String]("event_name")}"))
    }
    q.processAllAvailable()
    println(s"AFTER-CATCHUP: ${java.util.List.copyOf(delivered)}")
    (4 to 5).foreach(i => es.append(in(s"live-$i")))
    q.processAllAvailable()
    q.stop()
    println(s"AFTER-LIVE: ${java.util.List.copyOf(delivered)}")
    spark.stop()
  }
}
