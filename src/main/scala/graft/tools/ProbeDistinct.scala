package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch: distinct_agg plan + base/10× timing isolation
  * (the r9 driver recorded 5.08× for this leg; builder measurements
  * decide whether that is the plan or the machine).
  */
object ProbeDistinct {
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
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIME $label $s%.2f s"); s
    }
    val q = graft.SparkEntry.queries("distinct_agg")
    q(spark, sfDir).explain("formatted")
    // warm-up
    q(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
    val big = ScaleGen.ensure10x(spark, sfDir)
    def run(d: String) = q(spark, d).write.mode("overwrite").format("noop").save()
    val b1 = math.min(time("base-1") { run(sfDir) }, time("base-2") { run(sfDir) })
    val t1 = math.min(time("10x-1") { run(big) }, time("10x-2") { run(big) })
    println(f"RATIO ${t1 / b1}%.2f")
    spark.stop()
  }
}
