package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: persisted-index BM25 serve vs corpus scan, at the bench
  * corpus and its 10× replica — the measurement behind
  * [[graft.ops.Bm25Store]]'s scale claim. The claim under test: the
  * corpus-scan form ([[graft.ops.Ranking.bm25TopK]]) reads every
  * document's TEXT per query, while the index serve reads the query
  * terms' POSTING ROWS (bucket-pruned, term-pushed). At bench SF
  * both walls are sub-second and OVERHEAD-dominated (the serve path
  * pays a manifest resolve + a tiny bucket job the scan doesn't), so
  * the walls alone cannot separate the two — the claim-bearing
  * numbers are the STRUCTURAL bytes recorded beside them: corpus
  * text MB (the scan's per-query read) vs the MB of the ≤|terms|
  * bucket directories the pruned serve actually opens. Those are
  * what grow to 100 TB, and machine load cannot touch them.
  * Flatness of serve is NOT claimed: Σ df_t grows with the corpus
  * for a fixed query.
  *
  * [[measure]] is the ONE implementation behind both this tool and
  * the bench's `bm25_serve` diagnostic — two copies of a measurement
  * drift into measuring different things.
  */
object ProbeBm25Serve {

  // the gate's query (SparkEntry.Bm25Terms/k1/b/topK) — restated here
  // because the probe must measure the exact gated workload
  private val Terms = Seq("spark", "join", "window")
  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 20

  private def secs(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  /** One scale's evidence: (build, scan, serve) walls plus the
    * STRUCTURAL bytes — corpus text MB (what the scan path must
    * read per query), total postings MB (the artifact), and the MB
    * of the ≤|terms| bucket directories the pruned read actually
    * opens. At bench SF both serving walls are sub-second and
    * overhead-dominated (manifest resolve + a tiny bucket job), so
    * the bytes are the claim-bearing numbers: they are what grows to
    * 100 TB, and machine load cannot touch them.
    */
  private def atScale(spark: SparkSession, dir: String,
      reps: Int): (Double, Double, Double, Double, Double, Double) = {
    val docs = graft.Tables.documents(spark, dir)
    val root = java.nio.file.Files.createTempDirectory("probe-bm25ix-")
    try {
      val build = secs(graft.ops.Bm25Store.seed(docs, root.toString))
      val scan = (1 to reps).map(_ => secs(
        graft.ops.Ranking.bm25TopK(docs, "text", "doc_id", Terms,
          k1 = K1, b = B, topK = TopK).collect())).min
      val serve = (1 to reps).map(_ => secs(
        graft.ops.Bm25Store.scoreQuery(spark, root.toString, Terms,
          k1 = K1, b = B, topK = TopK).collect())).min
      val textMb = docs.agg(sum(length(col("text"))))
        .head.getLong(0) / 1e6
      val gen = graft.streaming.GenIndex.currentGen(root.toString)
      def dirMb(p: String): Double = {
        val (fs, path) = graft.core.Fs.hadoop(p)
        fs.getContentSummary(path).getLength / 1e6
      }
      val postTotalMb = dirMb(s"$gen/postings")
      // the bucket dirs the gated query's pruned read opens
      val prunedMb = {
        import spark.implicits._
        val buckets = Terms.toDF("term")
          .select(pmod(xxhash64(col("term")),
            lit(graft.ops.Bm25Store.NumBuckets.toLong)))
          .distinct().collect().map(_.getLong(0)).toSeq
        buckets.map(b => dirMb(s"$gen/postings/tbucket=$b")).sum
      }
      (build, scan, serve, textMb, postTotalMb, prunedMb)
    } finally graft.core.Fs.deleteRecursively(root.toFile)
  }

  /** JSON body (no braces): walls + structural bytes at both scales. */
  def measure(spark: SparkSession, sfDir: String,
      reps: Int = 3): String = {
    val (b1, sc1, sv1, t1, pt1, pp1) = atScale(spark, sfDir, reps)
    val big = ScaleGen.ensure10x(spark, sfDir)
    val (b10, sc10, sv10, t10, pt10, pp10) = atScale(spark, big, reps)
    f""""build_1x":$b1%.3f,"scan_1x":$sc1%.3f,"serve_1x":$sv1%.3f,""" +
      f""""text_mb_1x":$t1%.2f,"post_mb_1x":$pt1%.2f,"pruned_mb_1x":$pp1%.3f,""" +
      f""""build_10x":$b10%.3f,"scan_10x":$sc10%.3f,"serve_10x":$sv10%.3f,""" +
      f""""text_mb_10x":$t10%.2f,"post_mb_10x":$pt10%.2f,"pruned_mb_10x":$pp10%.3f"""
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-bm25-serve")
      .config("spark.sql.shuffle.partitions", "32")
      // ScaleGen replicates events.parquet too (TIMESTAMP(NANOS))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("{" + measure(spark, sf) + "}")
    spark.stop()
  }
}
