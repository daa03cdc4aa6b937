package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dedup_pipeline timing at base vs the 10× replica — the
  * exact tier should absorb the replica duplicates, so the LSH tier's
  * cost stays near-constant.
  */
object ProbePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val repl = new java.io.File("/tmp").listFiles()
      .filter(_.getName.startsWith("graft-scale10x-sf0.1"))
      .filter(f => new java.io.File(f, "_COMPLETE").exists())
      .map(_.toString).sorted.lastOption.getOrElse(sys.error("no replica"))
    Seq(base, repl).foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.dedupPipeline(docs, "text", "doc_id", threshold = 0.5)
      out.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PIPELINE dir=$d docs=${docs.count()} secs=$secs%.2f")
    }
    spark.stop()
  }
}
