package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: count the Spark jobs one Bm25Store.append schedules —
  * the r19 evidence that the observed-metrics stats delta turned the
  * pre-r19 three batch-pass jobs (localCheckpoint materialization +
  * postings write + stats aggregation write) into one batch-pass
  * write plus a one-row ledger write.
  * Usage: runMain graft.tools.ProbeBm25Append
  */
object ProbeBm25Append {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val docs = graft.Tables.documents(spark, sf)
    val root = java.nio.file.Files
      .createTempDirectory("probe-bm25append-").toString
    graft.ops.Bm25Store.seed(docs.where(col("doc_id") % 10 =!= 0), root)
    Thread.sleep(500)
    val old = args.headOption.contains("old")
    (1 to 3).foreach { i =>
      jobs.set(0)
      val t0 = System.nanoTime()
      val batch = docs.where(col("doc_id") % 10 === 0 &&
        pmod(col("doc_id"), lit(30)) === lit(10L * (i - 1)))
      if (old) {
        // the pre-r19 body, replicated for the job-count comparison
        val gen = graft.streaming.GenIndex.currentGen(root)
        val base = batch.select(col("doc_id"), col("text"))
          .localCheckpoint()
        base.select(col("doc_id"),
            graft.ops.TextAnalysis.tokenCount(col("text")).as("dl"),
            explode(filter(split(col("text"), " "), t => t =!= ""))
              .as("term"))
          .groupBy(col("term"), col("doc_id"), col("dl"))
          .agg(count(lit(1)).as("tf"))
          .withColumn("tbucket", pmod(xxhash64(col("term")), lit(64L)))
          .write.partitionBy("tbucket").mode("append")
          .parquet(s"$gen/postings")
        base.agg(count(lit(1)).as("n_docs"),
            sum(graft.ops.TextAnalysis.tokenCount(col("text")))
              .as("sum_dl"))
          .coalesce(1).write.mode("append").parquet(s"$gen/stats")
      } else graft.ops.Bm25Store.append(batch, root)
      Thread.sleep(500) // listener bus drain
      println(f"append $i: ${jobs.get()} jobs, " +
        f"${(System.nanoTime() - t0) / 1e9 - 0.5}%.2f s")
    }
    graft.core.Fs.deleteRecursively(new java.io.File(root))
    spark.stop()
  }
}
