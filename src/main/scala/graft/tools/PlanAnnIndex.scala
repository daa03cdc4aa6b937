package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump the physical plan of an [[graft.ops.AnnIndex]]
  * query batch against a live persisted index (evidence for
  * PLANS.md — the gated query localCheckpoints its result after
  * deleting the index, so `tools.Plans` can't show this read).
  */
object PlanAnnIndex {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = graft.Tables.embeddings(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("plan-annix-")
    try {
      graft.ops.AnnIndex.seed(e, root.toString,
        nlist = graft.SparkEntry.IvfLists,
        trainIters = graft.SparkEntry.IvfIters,
        m = graft.SparkEntry.PqM, k = graft.SparkEntry.PqK,
        pqIters = graft.SparkEntry.PqIters)
      val qVecs = graft.ops.AnnIndex.collectQueryVecs(
        e.where(col("vec_id").isin(0, 1, 2)))
      val df = graft.ops.AnnIndex.queryBatch(spark, root.toString, qVecs,
        kNN = 5, nprobe = graft.SparkEntry.IvfPqProbes)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val gen = graft.streaming.GenIndex.currentGen(root.toString)
      val all = new java.io.File(s"$gen/codes").listFiles()
        .count(f => f.getName.startsWith("ivf_cid="))
      println(s"-- live list directories: $all; " +
        s"scan Location above lists only the probed subset --")
    } finally graft.core.Fs.deleteRecursively(root.toFile)
    spark.stop()
  }
}
