package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the r15 retrieval-quality additions:
  *
  *  - [[Similarity.binaryHammingRefineTopKBatch]]: the packed-word
  *    Hamming arithmetic equals the naive sign-mismatch count, and
  *    with rerank = |corpus| the refine tail makes the result
  *    IDENTICAL to the exact brute-force baseline (binary quantization
  *    only prunes candidates — the refine scores are exact cosines).
  *  - [[Ranking.mmrRerank]]: the first pick is the relevance argmax;
  *    a planted near-duplicate of the top hit is SKIPPED at step 2
  *    (the whole point of MMR); ranks are 1..k over distinct ids.
  *  - [[Ranking.ndcgAtK]]: label-pure neighborhoods score 1.0, a
  *    query whose label has no other member reads (n_rel=0, ndcg=0)
  *    instead of vanishing.
  *  - [[TextAnalysis.ngramNovelty]]: exact duplicates split 1.0/0.0
  *    by ingest order, unique text scores 1.0, sub-k-token docs are
  *    absent.
  */
class RankingEvalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Dims = 8
  private def vec(i: Long): Seq[Double] =
    (0 until Dims).map(j => ((i * 7 + j * 3) % 11 - 5).toDouble)

  private def corpus = {
    import spark.implicits._
    (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
  }

  test("packed-word hamming equals the naive sign-mismatch count") {
    val a = Seq.tabulate(70)(i => if ((i * 13) % 7 < 3) 1.0 else -2.0)
    val b = Seq.tabulate(70)(i => if ((i * 5) % 3 == 0) 0.5 else 0.0)
    val words = 2 // 70 dims -> 2 words
    val pa = Similarity.packSignBits(a, words)
    val pb = Similarity.packSignBits(b, words)
    val packed = pa.zip(pb)
      .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val naive = a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }
    assert(packed === naive)
  }

  test("full-rerank binary hamming == exact brute force") {
    val bq = Similarity.binaryHammingRefineTopKBatch(corpus,
        col("vec_id").isin(0, 1), kNN = 5, rerank = 40, dims = Dims)
      .orderBy("qid", "rk").collect().toSeq
    val q = corpus.where(col("vec_id").isin(0, 1))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val exact = Similarity.bruteForceTopK(corpus, q, 5)
      .orderBy("qid", "rk").collect().toSeq
    assert(bq === exact)
  }

  test("bounded rerank still returns k exact-cosine-scored rows") {
    val out = Similarity.binaryHammingRefineTopKBatch(corpus,
        col("vec_id") === 3, kNN = 3, rerank = 8, dims = Dims)
      .collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).distinct.length === 3)
    assert(out.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("mmr skips a planted near-duplicate of the top hit") {
    import spark.implicits._
    // query 0 at e1; ids 1 and 2 are (nearly) parallel top hits; id 3
    // is orthogonal-ish. MMR step 2 must prefer 3 over the duplicate.
    val rows = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.1, 0.0, 0.0)),
      (2L, Seq(0.9, 0.11, 0.0, 0.0)),
      (3L, Seq(0.7, 0.0, 0.7, 0.0)),
      (4L, Seq(0.0, 0.2, 0.1, 1.0)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Ranking.mmrRerank(df, queryId = 0L, n = 4, k = 3,
        lambda = 0.5, gamma = 0.5)
      .orderBy("rk").collect()
    assert(out.map(_.getLong(0)).toSeq.take(2) === Seq(1L, 3L))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getLong(0)).distinct.length === 3)
  }

  test("ndcg: pure neighborhoods score 1.0; empty label reads 0") {
    import spark.implicits._
    // two tight clusters with matching labels + one lone-label query
    val rows =
      (0L until 6L).map(i => (i, Seq(1.0 + 0.01 * i, 0.0), 1)) ++
      (6L until 12L).map(i => (i, Seq(0.0, 1.0 + 0.01 * i), 2)) ++
      Seq((12L, Seq(-1.0, -1.0), 3))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Ranking.ndcgAtK(df, col("vec_id").isin(0, 6, 12), k = 5)
      .orderBy("qid").collect()
    assert(out.length === 3)
    val byQ = out.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byQ(0L) === ((5L, 1.0)))
    assert(byQ(6L) === ((5L, 1.0)))
    assert(byQ(12L) === ((0L, 0.0)))
  }

  test("packSignBits properties: word count, bit budget, sign-flip " +
      "inverts exactly the nonzero dims") {
    // deterministic pseudo-random vectors over mixed signs and zeros
    (0 until 50).foreach { t =>
      val dims = 1 + (t * 37) % 130 // crosses 64 and 128 word borders
      val v = IndexedSeq.tabulate(dims) { i =>
        ((i * 31 + t * 17) % 7 - 3).toDouble / 2.0
      }
      val words = (dims + 63) / 64
      val packed = Similarity.packSignBits(v, words)
      assert(packed.length === words)
      val ones = packed.map(java.lang.Long.bitCount).sum
      assert(ones === v.count(_ > 0))
      // flipping all signs sets exactly the previously-unset NONZERO
      // positions: ones(v) + ones(-v) == count(v != 0)
      val flipped = Similarity.packSignBits(v.map(-_), words)
      val onesF = flipped.map(java.lang.Long.bitCount).sum
      assert(ones + onesF === v.count(_ != 0.0))
      // and the packed hamming between v and -v equals the nonzero
      // dim count (every nonzero sign disagrees, zeros agree)
      val ham = packed.zip(flipped)
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
      assert(ham === v.count(_ != 0.0))
    }
  }

  test("hashUniform/priority invariants: u strictly in (0,1), exact " +
      "dyadic, priority positive and weight-monotone per id") {
    import spark.implicits._
    val df = (0L until 200L).toDF("id")
    val u = Curation.hashUniform(col("id"), "proptest")
    val got = df.select(col("id"), u.as("u")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    got.foreach { case (id, uv) =>
      assert(uv > 0.0 && uv < 1.0, s"u out of range for $id: $uv")
      // exact dyadic: u * 2^32 must be a half-integer (h32 + 0.5)
      val scaled = uv * 4294967296.0
      assert(scaled == math.floor(scaled) + 0.5,
        s"u not an exact (h+0.5)/2^32 dyadic for $id: $uv")
    }
    // same id, larger weight => strictly larger priority (u fixed)
    got.take(20).foreach { case (id, uv) =>
      assert(10.0 / uv > 1.0 / uv)
    }
  }

  test("ngram novelty: duplicates split by ingest order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // first owner of its grams
      (2L, "alpha beta gamma delta"),   // exact dup -> 0.0
      (3L, "unique words only here"),   // 1.0
      (4L, "too short")                 // < k tokens -> absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "text", "doc_id", k = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val nov = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nov(1L) === 1.0)
    assert(nov(2L) === 0.0)
    assert(nov(3L) === 1.0)
  }
}
