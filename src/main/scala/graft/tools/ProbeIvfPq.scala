package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{broadcast, col, lit, pmod, row_number}
import org.apache.spark.sql.expressions.Window

/** Probe: composed IVF-PQ recall@5 vs the flat-ADC canary at the gated
  * geometry, swept over nprobe — backs the choice of
  * SparkEntry.IvfProbes (the bench diagnostic measures only the gated
  * value; this sweeps the knob).
  */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
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
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(d2.asc, col("vec_id"))))
      .where(col("rk") <= 5)
      .select("qid", "vec_id")
      .localCheckpoint()
    val tot = exact.count().toDouble
    val flat = graft.ops.Similarity.pqAdcTopKBatch(e, pred, kNN = 5,
        m = graft.SparkEntry.PqM, k = graft.SparkEntry.PqK,
        iters = graft.SparkEntry.PqIters)
      .select("qid", "vec_id")
    println(f"flat ADC recall@5: ${exact.intersect(flat).count() / tot}%.4f")
    for (np <- Seq(2, 3, 4, 5, 6)) {
      val got = graft.ops.Similarity.ivfPqTopKBatch(e, pred, kNN = 5,
          nlist = graft.SparkEntry.IvfLists, nprobe = np,
          trainIters = graft.SparkEntry.IvfIters,
          m = graft.SparkEntry.PqM, k = graft.SparkEntry.PqK,
          iters = graft.SparkEntry.PqIters)
        .select("qid", "vec_id")
      println(f"ivfpq nprobe=$np recall@5: ${exact.intersect(got).count() / tot}%.4f")
    }
    // same sweep at PRODUCTION PQ geometry (m=8, k=256) — backs the
    // ivfpq_recall_prod bench diagnostic and its stated margin vs the
    // flat prod canary
    val flatProd = graft.ops.Similarity.pqAdcTopKBatch(e, pred, kNN = 5,
        m = 8, k = 256, iters = graft.SparkEntry.PqIters)
      .select("qid", "vec_id")
    println(f"flat ADC PROD recall@5: ${exact.intersect(flatProd).count() / tot}%.4f")
    for (np <- Seq(2, 3, 4, 5, 6)) {
      val got = graft.ops.Similarity.ivfPqTopKBatch(e, pred, kNN = 5,
          nlist = graft.SparkEntry.IvfLists, nprobe = np,
          trainIters = graft.SparkEntry.IvfIters,
          m = 8, k = 256, iters = graft.SparkEntry.PqIters)
        .select("qid", "vec_id")
      println(f"ivfpq PROD nprobe=$np recall@5: ${exact.intersect(got).count() / tot}%.4f")
    }
    spark.stop()
  }
}
