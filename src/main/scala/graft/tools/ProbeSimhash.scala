package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing breakdown of the 128-bit simhash-pairs leg (the r9 record's
  * worst scale leg): fingerprint aggregation alone vs band-candidates
  * vs the full pairs query, at base and 10×. Decides whether the
  * fingerprint's 128-column bit-sum aggregation is the part worth
  * optimizing.
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    // CLI arg wins (the tool's original contract), env var second
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val bigDir = ScaleGen.ensure10x(spark, sfDir)
    Seq("base" -> sfDir, "10x" -> bigDir).foreach { case (tag, dir) =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      (1 to 2).foreach { pass =>
        val tFp = time {
          graft.ops.Dedup.simhash(docs, "text", "doc_id", bits = 128, shingleK = 3)
            .write.mode("overwrite").format("noop").save()
        }
        val fp = graft.ops.Dedup
          .simhash(docs, "text", "doc_id", bits = 128, shingleK = 3)
          .localCheckpoint()
        val tCand = time {
          graft.ops.Dedup.simhashBandCandidates(fp, 128, 8)
            .write.mode("overwrite").format("noop").save()
        }
        val tFull = time {
          graft.ops.Dedup.simhashPairs(docs, "text", "doc_id",
              bits = 128, bands = 8, maxDistance = 7, shingleK = 3)
            .write.mode("overwrite").format("noop").save()
        }
        println(f"[probe-simhash] $tag pass $pass fp=$tFp%.2f cand(fp cached)=$tCand%.2f full=$tFull%.2f")
      }
    }
    spark.stop()
  }
}
