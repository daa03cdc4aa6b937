package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: residual IVFADC recall vs the non-residual composed form at
  * the gated geometry (same exact-L2 ground truth and query batch as
  * the bench canaries) — residuals concentrate near the origin, so
  * the same m×k budget should recall at or above non-residual.
  */
object ProbeResidual {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.Tables.embeddings(spark, sf)
    val pred = pmod(col("vec_id"), lit(7)) === 3 && col("vec_id") < 2000
    val q = e.where(pred)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val d2 = graft.ops.Similarity.dot(col("embedding"), col("embedding")) -
      lit(2.0) * graft.ops.Similarity.dot(col("embedding"), col("qe")) +
      graft.ops.Similarity.dot(col("qe"), col("qe"))
    val exact = e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(d2.asc, col("vec_id"))))
      .where(col("rk") <= 5)
      .select("qid", "vec_id")
      .localCheckpoint()
    val tot = exact.count().toDouble
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      if (tot == 0) 0.0
      else exact.intersect(df.select("qid", "vec_id")).count() / tot
    val plain = recallOf(graft.ops.Similarity.ivfPqTopKBatch(e, pred,
      kNN = 5, nlist = graft.SparkEntry.IvfLists,
      nprobe = graft.SparkEntry.IvfPqProbes,
      trainIters = graft.SparkEntry.IvfIters,
      m = graft.SparkEntry.PqM, k = graft.SparkEntry.PqK,
      iters = graft.SparkEntry.PqIters))
    val resid = recallOf(graft.ops.Similarity.ivfPqResidualTopKBatch(e, pred,
      kNN = 5, nlist = graft.SparkEntry.IvfLists,
      nprobe = graft.SparkEntry.IvfPqProbes,
      trainIters = graft.SparkEntry.IvfIters,
      m = graft.SparkEntry.PqM, k = graft.SparkEntry.PqK,
      iters = graft.SparkEntry.PqIters))
    // and at production PQ geometry (m=8, k=256) — the shape that runs
    val plainProd = recallOf(graft.ops.Similarity.ivfPqTopKBatch(e, pred,
      kNN = 5, nlist = graft.SparkEntry.IvfLists,
      nprobe = graft.SparkEntry.IvfPqProbes,
      trainIters = graft.SparkEntry.IvfIters,
      m = 8, k = 256, iters = graft.SparkEntry.PqIters))
    val residProd = recallOf(graft.ops.Similarity.ivfPqResidualTopKBatch(
      e, pred, kNN = 5, nlist = graft.SparkEntry.IvfLists,
      nprobe = graft.SparkEntry.IvfPqProbes,
      trainIters = graft.SparkEntry.IvfIters,
      m = 8, k = 256, iters = graft.SparkEntry.PqIters))
    println(f"gate geometry (m=4,k=8):   non-residual $plain%.4f | residual $resid%.4f")
    println(f"prod geometry (m=8,k=256): non-residual $plainProd%.4f | residual $residProd%.4f")
    spark.stop()
  }
}
