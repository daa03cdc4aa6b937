package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch: per-lookup latency of the jobless head probe. */
object ProbeHeads {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("probe-heads-lat-").toString
    val es = graft.api.EventStore.open(spark, dir, 8, maxInlineHeads = 64)
    (0 until 4).foreach { b =>
      es.appendMany((0 until 128).map(i =>
        graft.core.EventInput(s"lat-$b-$i", "E")))
    }
    val times = (0 until 32).map { i =>
      val t0 = System.nanoTime()
      require(es.sver(s"lat-${i % 4}-${i * 3 % 128}").isDefined)
      (System.nanoTime() - t0) / 1e6
    }
    println(f"first=${times.head}%.1f ms")
    println(f"rest_mean=${times.tail.sum / times.tail.size}%.2f ms")
    println(f"rest_max=${times.tail.max}%.2f ms")
    spark.stop()
  }
}
