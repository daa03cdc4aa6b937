package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.GenIndex

/** Generation-addressed PERSISTED BPE tokenizer — the one
  * LLM-pipeline artifact that previously lived only as an in-session
  * merge list. Production trains a tokenizer once and ships it to
  * every downstream job (the reference's build-once-at-seal,
  * apply-per-record discipline,
  * `/root/reference/crates/sierradb/src/writer_thread_pool.rs:698-793`,
  * applied to the tokenizer instead of an index); this store gives
  * the trained merge table the exact lifecycle the ANN index model
  * already has ([[AnnIndex]]): a [[GenIndex]] root whose generations
  * each hold the full frozen artifact, an atomic manifest flip, and a
  * reseed path for corpus drift.
  *
  * Per-generation layout under `root/gen-NNNNN/`:
  *  - `merges`  — the merge table in APPLICATION ORDER (ord, a, b):
  *    the tokenizer contract. Coalesced to one file — thousands of
  *    rows at production depth, driver-collected once per reader.
  *  - `vocab`   — the encoded training vocabulary (word, nsym, wenc):
  *    a CACHE of the merge chain's output per distinct training word,
  *    so a fresh reader encodes by vocab-join without re-running the
  *    |vocab| × k chain. Never consulted for correctness: [[encode]]
  *    falls back to the merge chain for words the cache misses
  *    (corpus drift), so a stale cache can never change a token.
  *
  * Reader safety is the GenIndex contract: [[encode]] resolves the
  * manifest ONCE and reads merges + vocab from that one generation —
  * a reseed flipping mid-read cannot hand a reader gen-N merges with
  * gen-N+1 vocab. Reseed on an unchanged corpus republishes the
  * bit-identical tokenizer (training is a pure function of the
  * corpus — BpeStoreSpec pins it, the AnnIndex reseed discipline).
  *
  * Scale shape: training collapses the corpus to its vocabulary in
  * one map-side-combinable pass (see [[BpeTrain.trainBpe]]); the
  * persisted artifact is KBs-to-MBs (merge table + vocab), so every
  * reader's planning cost is a bounded driver collect, and the encode
  * itself is [[BpeTrain.bpeEncodeWithVocab]]'s one token-stream
  * shuffle — corpus-linear, merge-depth-independent.
  */
object BpeStore {

  /** Train `numMerges` merges on the corpus and publish generation 0. */
  def seed(docs: DataFrame, root: String, numMerges: Int,
      textCol: String = "text"): Unit =
    GenIndex.init(root)(dir => writeGen(docs, dir, numMerges, textCol))

  /** RESEED: retrain on the CURRENT corpus into the next generation
    * and atomically flip the manifest — the model-refresh path once
    * the corpus drifts from seed-time (a tokenizer is per-corpus-era,
    * not forever). Readers that resolved before the flip finish
    * against their own generation; `retain` old generations survive.
    */
  def reseed(docs: DataFrame, root: String, numMerges: Int,
      textCol: String = "text", retain: Int = 1): Unit = {
    val (_, next) = GenIndex.nextGen(root)
    writeGen(docs, s"$root/$next", numMerges, textCol)
    GenIndex.publish(root, next, retain)
  }

  private def writeGen(docs: DataFrame, dir: String, numMerges: Int,
      textCol: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = BpeTrain.trainBpe(docs, textCol, numMerges)
    merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("ord", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    // the FOLD vocabulary builder, not the chained-replace expression:
    // the store is the production artifact, and the expression shape
    // dies of plan depth past ~512 merges (bpe_depth measurement) —
    // the fold's plan is O(1) in merge count
    BpeTrain.encodedVocabFold(docs, textCol, merges)
      .write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** The live generation's merge table in application order — row
    * order is NOT a parquet contract, so the reader re-sorts on the
    * persisted `ord` (the [[AnnIndex.readModel]] discipline).
    */
  def readMerges(spark: SparkSession, root: String): Seq[(String, String)] =
    readMergesAt(spark, GenIndex.currentGen(root))

  private def readMergesAt(spark: SparkSession,
      gen: String): Seq[(String, String)] =
    spark.read.parquet(s"$gen/merges")
      .orderBy(col("ord")).collect().toSeq
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")))

  /** A reader bound to ONE resolved generation: the merge table
    * (driver-collected, KBs) plus the vocabulary cache
    * (localCheckpointed — read from the store once, reused across
    * every batch this reader encodes). The shape for callers that
    * encode MANY batches against a single tokenizer snapshot — the
    * streaming gate resolves here once at stream start instead of
    * re-resolving per micro-batch, which is both cheaper and the
    * stronger consistency statement (every micro-batch tokenized by
    * the same generation even if a reseed flips mid-stream).
    */
  final case class Reader(merges: Seq[(String, String)], vocab: DataFrame)

  def resolve(spark: SparkSession, root: String): Reader = {
    val gen = GenIndex.currentGen(root)
    Reader(readMergesAt(spark, gen),
      spark.read.parquet(s"$gen/vocab").localCheckpoint())
  }

  /** Encode one batch with an already-resolved [[Reader]] — identical
    * output contract to [[encode]], minus the per-call manifest
    * resolve and vocab read.
    */
  def encodeWith(r: Reader, docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      samplePred: Column = lit(false)): DataFrame =
    BpeTrain.bpeEncodeWithVocab(docs, textCol, idCol, r.vocab, r.merges,
      samplePred)

  /** Encode a corpus with the PERSISTED tokenizer: one manifest
    * resolve (merges and vocab from the SAME generation), then the
    * vocab-join encode with the merge-chain fallback for words the
    * persisted vocabulary has never seen. Output contract identical
    * to [[BpeTrain.bpeEncode]] — persistence changes where the
    * tokenizer lives, never what it returns (the gate shares the
    * in-session encode's oracle verbatim).
    */
  def encode(docs: DataFrame, root: String, idCol: String = "doc_id",
      textCol: String = "text",
      samplePred: Column = lit(false)): DataFrame = {
    val spark = docs.sparkSession
    val gen = GenIndex.currentGen(root)
    BpeTrain.bpeEncodeWithVocab(docs, textCol, idCol,
      spark.read.parquet(s"$gen/vocab"), readMergesAt(spark, gen),
      samplePred)
  }
}
