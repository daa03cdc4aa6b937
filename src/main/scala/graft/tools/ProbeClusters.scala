package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch: split the dedup_clusters leg cost into its LSH
  * pair tier vs the CC fixpoint at base and 10×.
  */
object ProbeClusters {
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
    // the bench's between-leg hygiene — without it the probe's own
    // leftover localCheckpoint blocks poison later legs and the
    // numbers stop being comparable to bench legs
    def hygiene(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val big = ScaleGen.ensure10x(spark, sfDir)
    for ((label, dir) <- Seq(("base", sfDir), ("10x", big)); pass <- 1 to 2) {
      val docs = graft.Tables.documents(spark, dir)
      time(s"$label-$pass pairs-only") {
        graft.ops.Dedup.minhashLsh(docs, "text", "doc_id", threshold = 0.5)
          .write.mode("overwrite").format("noop").save()
      }
      hygiene()
      time(s"$label-$pass full-clusters") {
        val pairs = graft.ops.Dedup.minhashLsh(docs, "text", "doc_id",
          threshold = 0.5)
        val (cc, _) = graft.ops.Dedup.connectedComponentsWithRounds(
          pairs.select(col("a"), col("b")))
        cc.write.mode("overwrite").format("noop").save()
      }
      hygiene()
    }
    spark.stop()
  }
}
