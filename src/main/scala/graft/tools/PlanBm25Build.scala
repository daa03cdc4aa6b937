package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only plan evidence for the r19 Bm25Store one-pass build: prints
  * the PRE-r19 two-pass shape (postings plan + the separate stats
  * corpus-scan plan) and the r19 shape (one postings plan carrying a
  * CollectMetrics node that computes the stats delta in the same pass;
  * the ledger row is then a driver-built one-row write, no corpus
  * scan). Usage: runMain graft.tools.PlanBm25Build [before|after]
  */
object PlanBm25Build {
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
    val docs = graft.Tables.documents(spark, sf)
    val base = docs.select(col("doc_id"), col("text"))
    def postingsOf(b: org.apache.spark.sql.DataFrame) =
      b.select(col("doc_id"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("dl"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("term"))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("tbucket",
          pmod(xxhash64(col("term")), lit(graft.ops.Bm25Store.NumBuckets.toLong)))
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val mode = args.headOption.getOrElse("after")
    if (mode == "before") {
      println("===== bm25 writeGen BEFORE (pass 1 of 2: postings) =====")
      println(fmt(postingsOf(base).repartition(col("tbucket"))))
      println("===== bm25 writeGen BEFORE (pass 2 of 2: stats corpus scan) =====")
      println(fmt(base.agg(count(lit(1)).as("n_docs"),
        sum(graft.ops.TextAnalysis.tokenCount(col("text"))).as("sum_dl"))))
    } else {
      val obs = org.apache.spark.sql.Observation()
      println("===== bm25 writeGen AFTER (single pass: postings + " +
        "CollectMetrics stats) =====")
      println(fmt(postingsOf(base.observe(obs,
          count(lit(1)).as("n_docs"),
          sum(graft.ops.TextAnalysis.tokenCount(col("text"))).as("sum_dl")))
        .repartition(col("tbucket"))))
      println("(stats ledger row: driver-built 1-row parquet write from " +
        "the observed metrics — no second corpus scan)")
    }
    spark.stop()
  }
}
