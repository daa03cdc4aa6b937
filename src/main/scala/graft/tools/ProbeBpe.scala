package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the text_bpe_tokens leg measured off-load (min-of-3, base
  * and 10×), next to a scan-only floor (same read, `length` instead
  * of the regex) — settles whether the leg's three-round ratio drift
  * (1.97 → 4.17 → 4.87, each under load 11-23) is the operator or the
  * machine. The leg is one codegen'd `regexp_count` pass per document
  * (no broadcast, no shuffle before the orderBy), so off-load its 10×
  * ratio should track the text-volume ratio.
  */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val big = ScaleGen.ensure10x(spark, sf)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bpe(dir: String): Double = time {
      graft.SparkEntry.queries("text_bpe_tokens")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    def floor(dir: String): Double = time {
      graft.Tables.documents(spark, dir)
        .select(col("doc_id"), length(col("text")).cast("long").as("n"))
        .orderBy(col("doc_id"))
        .write.mode("overwrite").format("noop").save()
    }
    for (round <- 1 to 3) {
      val fb = floor(sf); val f10 = floor(big)
      val b = bpe(sf); val b10 = bpe(big)
      println(f"round $round: floor base $fb%.2f 10x $f10%.2f " +
        f"(ratio ${f10 / fb}%.2f) | bpe base $b%.2f 10x $b10%.2f " +
        f"(ratio ${b10 / b}%.2f) | load ${java.lang.management
          .ManagementFactory.getOperatingSystemMXBean
          .getSystemLoadAverage}%.1f")
    }
    spark.stop()
  }
}
