package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: BPE encode wall vs merge-table depth, direct chained-replace
  * projection vs the vocab-join swap — settles where the documented
  * crossover actually sits on this corpus (the "vocab-join wins at
  * production depth" claim needs a measured curve, not prose). The
  * merge table is SYNTHETIC (batched rounds of pair statistics — see
  * `BpeTrain.syntheticMerges`): apply cost depends on the table's
  * size and hit rate, not on the merges being the argmax sequence,
  * and both encoders must agree on ANY table (asserted per depth via
  * the corpus-wide token-count aggregate).
  *
  * [[sweep]] is the ONE implementation behind both this tool and the
  * bench's `bpe_depth` diagnostic — two copies of a measurement drift
  * into measuring different things.
  */
object ProbeBpeDepth {

  /** One measured cell: (depth, direct sec, vocab-join sec, paths
    * agree on the corpus token sum). A cell whose passes THREW is
    * (k, -1, -1, false) — a per-depth failure marker, so a pathology
    * at the deepest cell never discards the shallower cells' points.
    */
  def sweep(docs: DataFrame, maxDepth: Int = 1024)
      : (Int, Seq[(Int, Double, Double, Boolean)]) = {
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val merges = graft.ops.BpeTrain.syntheticMerges(docs, "text", maxDepth)
    val depths = (Seq(16, 64, 256).filter(_ < merges.length) :+
      merges.length).distinct
    val cells = depths.map { k =>
      try {
        val mk = merges.take(k)
        var sd = -1L
        var sv = -2L
        val td = time {
          sd = graft.ops.BpeTrain
            .bpeEncode(docs, "text", "doc_id", mk, lit(false))
            .agg(sum(col("n_bpe_tokens"))).collect()(0).getLong(0)
        }
        val tv = time {
          sv = graft.ops.BpeTrain
            .bpeEncodeVocab(docs, "text", "doc_id", mk, lit(false))
            .agg(sum(col("n_bpe_tokens"))).collect()(0).getLong(0)
        }
        (k, td, tv, sd == sv)
      } catch { case e: Throwable =>
        System.err.println(s"[bpe-depth] cell k=$k failed: ${e.getMessage}")
        (k, -1.0, -1.0, false)
      }
    }
    (merges.length, cells)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (tableDepth, cells) = sweep(graft.Tables.documents(spark, sf))
    println(s"synthetic merge table: $tableDepth pairs")
    cells.foreach { case (k, td, tv, ok) =>
      println(f"k=$k%4d: direct $td%7.2f s | vocab-join $tv%7.2f s | " +
        s"equal=$ok")
    }
    spark.stop()
  }
}
