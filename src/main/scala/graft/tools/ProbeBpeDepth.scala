package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: BPE encode wall vs merge-table depth, direct chained-replace
  * projection vs the vocab-join swap — settles where the documented
  * crossover actually sits (the "vocab-join wins at production depth"
  * claim needs a measured curve, not prose). The merge table is
  * SYNTHETIC (batched rounds of pair statistics — see
  * `BpeTrain.syntheticMerges`): apply cost depends on the table's
  * size and hit rate, not on the merges being the argmax sequence,
  * and both encoders must agree on ANY table (asserted per depth via
  * the corpus-wide token-count aggregate).
  *
  * Depths past this corpus's merge exhaustion (~150 at bench SF) are
  * reached with [[padMerges]] — production tables are 30k+ merges and
  * a curve capped at 10² was an extrapolation, not a measurement.
  *
  * BUDGETED (default 300 s, `SPARK_GRAFT_BPE_DEPTH_BUDGET_SEC` in the
  * bench): a deep chained-replace plan can hit a compile-time cliff,
  * and finding that cliff is the point — but the bench's wall must
  * stay bounded, so each pass runs on a watchdog thread (job-group
  * cancel + abandon on timeout) and cells past the budget are
  * recorded as skipped (-2), never silently dropped.
  *
  * [[sweep]] is the ONE implementation behind both this tool and the
  * bench's `bpe_depth` diagnostic — two copies of a measurement drift
  * into measuring different things.
  */
object ProbeBpeDepth {

  /** Padding merges past this corpus's exhaustion depth (the
    * vocabulary collapses to single symbols after ~150 real merges at
    * bench SF): deterministic pairs over a \u0005-prefixed alphabet
    * that occurs in no document and no real merge product, so a
    * padding merge can never change a token — but the encoders cannot
    * know that, so each still costs what a zero-hit real merge costs:
    * one literal-replace scan per row (direct) / per vocab word
    * (vocab-join) and one more level of expression depth in the plan.
    * That is exactly the term the depth diagnostic measures — where
    * the k-deep chained-replace plan stops being viable
    * (plan-size/compile-time cliff, not just wall) — and it is a
    * LOWER bound on real-merge cost (hits add string rebuilds). Token
    * sums at padded depths must equal the full-real-table sums, which
    * the per-cell agreement check enforces for free.
    */
  def padMerges(from: Int, to: Int): Seq[(String, String)] =
    (from until to).map(i => ("\u0005a" + i, "\u0005b" + i))

  /** One measured cell: (depth, direct sec, vocab-join sec, fold sec,
    * measured paths agree on the corpus token sum). A cell whose pass
    * THREW or was cancelled records -1 for that pass; a cell (or
    * pass) never started because the budget was spent records -2 —
    * per-depth markers, so a pathology at the deepest cell never
    * discards the shallower cells' points and a skip is
    * distinguishable from a failure. The FOLD path
    * (`BpeTrain.bpeEncodeVocabFold` — merge table as closure data,
    * plan size O(1) in depth) is the one expected to survive past the
    * expression shapes' plan-depth cliff; its agreement with whatever
    * else measured is the depth-extrapolated correctness evidence.
    */
  def sweep(docs: DataFrame, maxDepth: Int = 8192,
      budgetSec: Double = 300.0)
      : (Int, Seq[(Int, Double, Double, Double, Boolean)]) = {
    val spark = docs.sparkSession
    val t0 = System.nanoTime()
    def elapsed = (System.nanoTime() - t0) / 1e9
    // one timed pass, bounded: the pass runs on a daemon worker (its
    // OWN job group — setJobGroup is thread-local) joined with the
    // sweep's remaining budget; on timeout the group is cancelled and
    // the worker abandoned. Driver-side plan analysis is not
    // cancellable, but once a timeout fires elapsed ≥ budget, so every
    // remaining cell is skipped and an abandoned analysis never
    // overlaps another timed pass.
    def timedPass(label: String)(f: => Long): (Double, Long) = {
      val group = s"bpe-depth-$label"
      val remainMs = math.max(5000L, ((budgetSec - elapsed) * 1000).toLong)
      @volatile var out: (Double, Long) = (-1.0, Long.MinValue)
      val worker = new Thread(() => {
        spark.sparkContext.setJobGroup(group, label, interruptOnCancel = true)
        try {
          val s0 = System.nanoTime()
          val sum = f
          out = ((System.nanoTime() - s0) / 1e9, sum)
        } catch { case e: Throwable =>
          // e.toString, not getMessage: a StackOverflowError from a
          // plan-depth cliff carries a null message, and the CLASS is
          // the finding
          System.err.println(s"[bpe-depth] $label failed: $e")
        } finally spark.sparkContext.clearJobGroup()
      })
      worker.setDaemon(true)
      worker.start()
      worker.join(remainMs)
      if (worker.isAlive) {
        System.err.println(s"[bpe-depth] budget: cancelling $label")
        spark.sparkContext.cancelJobGroup(group)
        worker.join(10000)
      }
      out
    }
    val real = graft.ops.BpeTrain.syntheticMerges(docs, "text", maxDepth)
    val merges =
      if (real.length >= maxDepth) real
      else real ++ padMerges(real.length, maxDepth)
    val depths = (Seq(16, 64, real.length, 512, 2048) :+ merges.length)
      .filter(d => d > 0 && d <= merges.length).distinct.sorted
    val cells = depths.map { k =>
      if (elapsed > budgetSec) (k, -2.0, -2.0, -2.0, false)
      else {
        val mk = merges.take(k)
        def pass(label: String,
            enc: => org.apache.spark.sql.DataFrame): (Double, Long) =
          if (elapsed > budgetSec) (-2.0, Long.MinValue)
          else timedPass(s"$label-$k") {
            enc.agg(sum(col("n_bpe_tokens"))).collect()(0).getLong(0)
          }
        val (td, sd) = pass("direct", graft.ops.BpeTrain
          .bpeEncode(docs, "text", "doc_id", mk, lit(false)))
        val (tv, sv) = pass("vocab", graft.ops.BpeTrain
          .bpeEncodeVocab(docs, "text", "doc_id", mk, lit(false)))
        val (tf, sf) = pass("fold", graft.ops.BpeTrain
          .bpeEncodeVocabFold(docs, "text", "doc_id", mk, lit(false)))
        // agreement over the paths that MEASURED: at depths past the
        // expression cliff only the fold survives, which must not
        // read as disagreement
        val sums = Seq((td, sd), (tv, sv), (tf, sf))
          .collect { case (t, s) if t >= 0 => s }
        (k, td, tv, tf, sums.nonEmpty && sums.distinct.size == 1)
      }
    }
    (real.length, cells)
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
    val budget = args.headOption.map(_.toDouble).getOrElse(300.0)
    val (tableDepth, cells) =
      sweep(graft.Tables.documents(spark, sf), budgetSec = budget)
    println(s"real merge table: $tableDepth pairs (deeper cells padded)")
    cells.foreach { case (k, td, tv, tf, ok) =>
      println(f"k=$k%5d: direct $td%8.2f s | vocab-join $tv%8.2f s | " +
        f"fold $tf%8.2f s | equal=$ok")
    }
    spark.stop()
  }
}
