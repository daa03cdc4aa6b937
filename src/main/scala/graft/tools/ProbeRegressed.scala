package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the two legs whose BENCH_r12 driver readings regressed vs
  * r11 under saturation witnesses, measured off-load (min-of-3, base
  * and 10×) — the settle-the-trend discipline of tools/ProbeBpe /
  * ProbeContainment:
  *
  *  - `dedup_minhash_incremental` 2.40 → 4.73 (witness load 20.9,
  *    cpu_ratio 13.6): probe-side banding + candidate-restricted
  *    Jaccard verify. The volume diagnostic counts the candidate
  *    pairs the probe generates at base vs 10× — if candidates grow
  *    ~n× while wall grows less, the plan is sublinear per unit of
  *    work and the record reading was the machine's.
  *  - `es_ingest_versions` 1.22 → 4.66 (cpu_ratio 19.8): a sorted
  *    full scan of the ingested store. The store is WARMED first for
  *    both dirs (the bench times ingest as its own leg), so the probe
  *    times exactly what the bench leg times: scan + global sort.
  */
object ProbeRegressed {
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def leg(name: String, dir: String): Double = time {
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    def load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    // candidate-pair volume of the minhash incremental probe: new-side
    // band keys joined to the full corpus index on (band, bkey) — the
    // same candidate mass the leg verifies, counted without the verify
    def mhVolume(dir: String): Long = {
      val docs = graft.Tables.documents(spark, dir)
      val isNew = graft.ops.Curation.hashBucket(col("doc_id"), "ingest")
        .<(lit(1000))
      val sh = graft.ops.Dedup.wordShingles(docs, "text", "doc_id", 3)
      val keys = graft.ops.Dedup.bandKeys(
        graft.ops.Dedup.minhashSignatures(sh, 8), 4, 2).localCheckpoint()
      val nw = keys.join(docs.where(isNew).select(col("doc_id").as("id")), "id")
      nw.select(col("band"), col("bkey"), col("id").as("x"))
        .join(keys.select(col("band"), col("bkey"), col("id").as("y")),
          Seq("band", "bkey"))
        .where(col("x") =!= col("y"))
        .select(least(col("x"), col("y")), greatest(col("x"), col("y")))
        .distinct().count()
    }
    val vB = mhVolume(sf); val v10 = mhVolume(big)
    println(f"minhash_inc candidate pairs: $vB -> $v10 " +
      f"(${v10.toDouble / vB}%.1fx)")

    // warm both stores so neither leg pays ingest inside its timing
    graft.StoreProvider.storeFor(spark, sf)
    graft.StoreProvider.storeFor(spark, big)

    for (round <- 1 to 3) {
      val m = leg("dedup_minhash_incremental", sf)
      val m10 = leg("dedup_minhash_incremental", big)
      val e = leg("es_ingest_versions", sf)
      val e10 = leg("es_ingest_versions", big)
      println(f"round $round: minhash_inc base $m%.2f 10x $m10%.2f " +
        f"(ratio ${m10 / m}%.2f) | ingest_versions base $e%.2f " +
        f"10x $e10%.2f (ratio ${e10 / e}%.2f) | load $load%.1f")
    }
    spark.stop()
  }
}
