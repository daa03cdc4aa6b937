package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: 128-bit simhash pairs timing + candidate ratio at a given
  * dir (compare base vs the ScaleGen 10× replica).
  */
object Probe128 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft-scale10x-sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val n = docs.count().toDouble
      val t0 = System.nanoTime()
      graft.ops.Dedup.simhashPairs(docs, "text", "doc_id",
          bits = 128, bands = 8, maxDistance = 7)
        .write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.ops.Dedup.simhashPairs(docs, "text", "doc_id",
          bits = 64, bands = 4, maxDistance = 3)
        .write.mode("overwrite").format("noop").save()
      val secs64 = (System.nanoTime() - t1) / 1e9
      println(f"PROBE64 dir=$d pairs64_secs=$secs64%.2f")
      val fp = graft.ops.Dedup.simhash(docs, "text", "doc_id", 128, 3)
        .localCheckpoint()
      val cand = graft.ops.Dedup.simhashBandCandidates(fp, 128, 8).count().toDouble
      println(f"PROBE128 dir=$d docs=${n.toLong} pairs_secs=$secs%.2f " +
        f"cand_ratio=${cand / (n * (n - 1) / 2)}%.4f")
    }
    spark.stop()
  }
}
