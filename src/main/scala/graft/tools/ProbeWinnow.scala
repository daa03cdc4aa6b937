package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch: winnow leg timings at base/10× (the HOF
  * formulation hung ~30 min on one task; the native pass must be
  * seconds).
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val big = ScaleGen.ensure10x(spark, sfDir)
    for ((label, dir) <- Seq(("base", sfDir), ("10x", big)); pass <- 1 to 2)
      for (q <- Seq("dedup_winnow", "dedup_winnow_pairs",
          "dedup_winnow_incremental"))
        time(s"$label-$pass $q") {
          graft.SparkEntry.queries(q)(spark, dir)
            .write.mode("overwrite").format("noop").save()
        }
    spark.stop()
  }
}
