package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated timing of the quality-filter leg at base and 10× — chases
  * the run-to-run bimodality seen in the r9 reproducibility check
  * (5.5 s vs 17.9 s for the same 10× leg, min-of-2 in both runs).
  */
object ProbeQuality {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val fn = graft.SparkEntry.queries("curation_quality_filter")
    val bigDir = ScaleGen.ensure10x(spark, sfDir)
    (1 to 5).foreach { i =>
      val b = time { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      val s = time { fn(spark, bigDir).write.mode("overwrite").format("noop").save() }
      println(f"[probe-quality] pass $i base=$b%.2f 10x=$s%.2f")
    }
    spark.stop()
  }
}
