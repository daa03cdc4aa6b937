package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch: near-dup workload shape at base vs 10× — LSH
  * candidate pairs, verified pairs (threshold 0.5), and CC edge mass.
  * Decides whether a clusters/pipeline 10× ratio >4 is workload growth
  * (replica mutation leaving identical cross-replica shingles) or
  * machine state.
  */
object ProbePairs {
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
    val big = ScaleGen.ensure10x(spark, sfDir)
    for ((label, dir) <- Seq(("base", sfDir), ("10x", big))) {
      val docs = graft.Tables.documents(spark, dir)
      val sh = graft.ops.Dedup.wordShingles(docs, "text", "doc_id", 3)
      val sig = graft.ops.Dedup.minhashSignatures(sh, 8)
      val cand = graft.ops.Dedup.minhashCandidates(sig, 4, 2)
      val nCand = cand.count()
      val verified = graft.ops.Dedup.jaccardForCandidates(cand, sh)
        .where(col("jaccard") >= 0.5)
      val nVer = verified.count()
      println(s"PAIRS $label docs=${docs.count()} candidates=$nCand verified@0.5=$nVer")
    }
    spark.stop()
  }
}
