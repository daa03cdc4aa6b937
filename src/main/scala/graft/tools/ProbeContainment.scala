package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: the dedup_containment leg measured off-load (min-of-3, base
  * and 10×) — its record ratio bounces with machine load (4.38 →
  * 2.74 → 4.55 across r10-r12, every high reading carrying a
  * saturation witness: cpu_ratio 14-18, load 13-19 during the 10×
  * sweep). Same settle-the-trend discipline as tools/ProbeBpe: the leg
  * is a shingle inverted-index self-join with a maxDf posting cap, all
  * shuffle + CPU, so under contention its 10× reading inflates; the
  * idle number is the plan's own cost.
  */
object ProbeContainment {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // `100x` arg: probe the 100× replica instead of the 10× one — the
    // Probe100x sweep measures containment while its own 9 other legs
    // saturate the box (r15: 27.5 at load 29.7); this mode gives the
    // leg its attributable solo reading + the candidate-volume
    // diagnostic at the same factor.
    val big =
      if (args.contains("100x")) Probe100x.ensure100x(spark, sf)
      else ScaleGen.ensure10x(spark, sf)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def leg(dir: String): Double = time {
      graft.SparkEntry.queries("dedup_containment")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    // pair-volume diagnostic: the candidate stream (shared-shingle
    // pairs BEFORE the threshold) is the superlinear intermediate — if
    // it grows ~n× while wall-clock grows less, the leg is sublinear
    // per unit of real work and the ratio is the workload's, not a
    // plan defect
    import org.apache.spark.sql.functions._
    def volume(dir: String): (Long, Long) = {
      val sh0 = graft.ops.Dedup.wordShingles(
        graft.Tables.documents(spark, dir), "text", "doc_id", 3)
      val capped = sh0.join(
        sh0.groupBy(col("sh")).agg(count(lit(1)).as("df_c"))
          .where(col("df_c") <= graft.SparkEntry.NgramMaxDf).select("sh"),
        "sh").localCheckpoint()
      val pairs = capped.select(col("id").as("a"), col("sh"))
        .join(capped.select(col("id").as("b"), col("sh")), "sh")
        .where(col("a") < col("b")).count()
      (capped.count(), pairs)
    }
    // label follows the replica actually probed — a 100x reading
    // printed as "10x" would record a 10x-inflated superlinearity
    // signal under the record-is-the-record discipline
    val lbl = if (args.contains("100x")) "100x" else "10x"
    val (shB, prB) = volume(sf); val (sh10, pr10) = volume(big)
    println(f"volume ($lbl): capped shingles $shB -> $sh10 " +
      f"(${sh10.toDouble / shB}%.1fx) | candidate pairs $prB -> $pr10 " +
      f"(${pr10.toDouble / prB}%.1fx)")
    for (round <- 1 to 3) {
      val b = leg(sf); val b10 = leg(big)
      println(f"round $round: base $b%.2f s | $lbl $b10%.2f s | " +
        f"ratio ${b10 / b}%.2f | load ${java.lang.management
          .ManagementFactory.getOperatingSystemMXBean
          .getSystemLoadAverage}%.1f")
    }
    spark.stop()
  }
}
