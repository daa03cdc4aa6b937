package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: BPE encode wall vs merge-table depth, direct chained-replace
  * projection vs the vocab-join swap — settles where the documented
  * crossover actually sits on this corpus (the "vocab-join wins at
  * production depth" claim needs a measured curve, not prose). The
  * merge table is SYNTHETIC (top-k adjacent single-char pairs by
  * (cnt desc, a, b) from the real corpus — one pair-count pass, no
  * 1024-iteration training loop): apply cost depends on the table's
  * size and hit rate, not on the merges being the argmax sequence,
  * and both encoders must agree on ANY table (asserted per depth via
  * the corpus-wide token-count aggregate).
  */
object ProbeBpeDepth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, sf)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val merges = graft.ops.BpeTrain.syntheticMerges(docs, "text", 1024)
    println(s"synthetic merge table: ${merges.length} pairs")
    Seq(16, 64, 256).foreach { k =>
      val mk = merges.take(k)
      var sumDirect = -1L
      var sumVocab = -2L
      val td = time {
        sumDirect = graft.ops.BpeTrain
          .bpeEncode(docs, "text", "doc_id", mk, lit(false))
          .agg(sum(col("n_bpe_tokens"))).collect()(0).getLong(0)
      }
      val tv = time {
        sumVocab = graft.ops.BpeTrain
          .bpeEncodeVocab(docs, "text", "doc_id", mk, lit(false))
          .agg(sum(col("n_bpe_tokens"))).collect()(0).getLong(0)
      }
      println(f"k=$k%4d: direct $td%7.2f s | vocab-join $tv%7.2f s | " +
        f"equal=${sumDirect == sumVocab} (sum=$sumDirect)")
    }
    spark.stop()
  }
}
