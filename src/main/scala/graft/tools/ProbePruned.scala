package graft.tools

import graft.streaming.StreamingDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does the partition-pruned streaming dedup index actually pay
  * at the geometry where it matters — a corpus-sized index probed by a
  * SMALL micro-batch? Seeds the flat and the pruned simhash band index
  * from the 10× documents corpus, then times single micro-batch probes
  * of 16 / 64 docs against each, min-of-3, alongside the index rows
  * each probe's scan actually returns. `parts` must exceed the batch's
  * keyspace (|batch| × bands keys) for directory pruning to bite —
  * 1024 here, the knob a deployment sizes to its batch geometry; the
  * sf0.01 gate's default 64 is a correctness setting, not this probe's
  * scale setting.
  */
object ProbePruned {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val big = ScaleGen.ensure10x(spark, sf)
    val Parts = 1024
    val docs = graft.Tables.documents(spark, big)
      .select(col("doc_id").as("id"), col("text"))
    val corpus = docs.where(pmod(col("id"), lit(100L)) =!= 0L)
    val work = java.nio.file.Files.createTempDirectory("probe-pruned-")
    val flatDir = s"$work/flat"; val prunedDir = s"$work/pruned"
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      val tSeedFlat = time(StreamingDedup.seedSimhashIndex(
        corpus, "text", "id", flatDir))
      val tSeedPruned = time(StreamingDedup.seedSimhashIndexPruned(
        corpus, "text", "id", prunedDir, parts = Parts))
      // inflate both indexes ~100× with synthetic UNRELATED signatures
    // (negative ids, md5-derived fingerprints — uniform band keys, no
      // candidate matches), standing in for the corpus a production
      // index actually holds: the layout's question is what a SMALL
      // batch pays against a LARGE index, and the sf0.1 corpus alone
      // leaves every scan inside fixed-overhead noise
      val inflate = sys.env.getOrElse("PROBE_PRUNED_INFLATE", "100").toInt
      val nSynth = corpus.count() * inflate
      val sfp = spark.range(1L, nSynth + 1L)
        .select((-col("id")).as("id"),
          lpad(conv(substring(md5(col("id").cast("string")), 1, 15), 16, 2),
            64, "0").as("simhash"))
      val synth = graft.ops.Dedup.simhashBandKeys(sfp, 64, 4)
        .join(sfp, "id")
      val tInfFlat = time(synth.write.mode("append").parquet(flatDir))
      val tInfPruned = time(synth
        .withColumn("pfx",
          StreamingDedup.bkeyPrefix(col("band"), col("bkey"), Parts))
        .repartition(col("pfx"))
        .write.mode("append").partitionBy("pfx").parquet(prunedDir))
      val indexRows = spark.read.parquet(flatDir).count()
      println(f"seeded ${inflate}x-inflated index: $indexRows rows | " +
        f"flat seed $tSeedFlat%.1f+$tInfFlat%.1f s, " +
        f"pruned($Parts dirs) $tSeedPruned%.1f+$tInfPruned%.1f s")
      for (batchSize <- Seq(16, 64)) {
        val batch = docs.where(pmod(col("id"), lit(100L)) === 0L)
          .orderBy(col("id")).limit(batchSize).localCheckpoint()
        // rows the pruned probe's index scan returns (vs the full index
        // for the flat probe) — the I/O bound the layout exists for
        val fp = graft.ops.Dedup.simhash(batch, "text", "id", 64, 3)
        val keys = graft.ops.Dedup.simhashBandKeys(fp, 64, 4)
          .withColumn("pfx",
            StreamingDedup.bkeyPrefix(col("band"), col("bkey"), Parts))
        val touched = keys.select("pfx").distinct()
          .collect().map(_.getLong(0))
        val prunedRows = spark.read.parquet(prunedDir)
          .where(col("pfx").isin(touched: _*)).count()
        for (round <- 1 to 3) {
          // measure probes WITHOUT mutating the shared index: each run
          // appends, so give each its own copy of the dir tail... the
          // appended batch (≤64 docs × 4 bands) is noise against the
          // 10× index, so in-place appends are acceptable drift
          val tf = time {
            StreamingDedup.simhashProbeBatch(batch, "text", "id", flatDir)
              .write.mode("overwrite").format("noop").save()
          }
          val tp = time {
            StreamingDedup.simhashProbeBatchPruned(batch, "text", "id",
                prunedDir, parts = Parts)
              .write.mode("overwrite").format("noop").save()
          }
          println(f"batch=$batchSize round $round: flat $tf%.2f s | " +
            f"pruned $tp%.2f s (${touched.length} dirs, " +
            f"$prunedRows of $indexRows index rows) | load ${java.lang
              .management.ManagementFactory.getOperatingSystemMXBean
              .getSystemLoadAverage}%.1f")
        }
      }
    } finally {
      graft.core.Fs.deleteRecursively(work.toFile)
      spark.stop()
    }
  }
}
