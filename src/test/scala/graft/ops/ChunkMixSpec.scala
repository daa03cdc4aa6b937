package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantic tests for the r9 curation additions: chunk-level exact
  * substring dedup, temperature-scaled source mixing, and per-group
  * centroid cosine (the oracle gate proves engine-equivalence; these
  * prove the semantics on hand-built corpora with known answers).
  */
class ChunkMixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def chunkDocs = {
    import spark.implicits._
    Seq(
      (1L, "aaaabbbbcc"), // exact dup of doc 2 — every chunk shared
      (2L, "aaaabbbbcc"),
      (3L, "ddddeeee"),   // fully unique — untouched
      (4L, "aaaazzzz"),   // shares only its first chunk with 1/2
      (5L, "")            // empty — zero chunks
    ).toDF("doc_id", "text")
  }

  test("chunkDedup drops every occurrence of shared chunks, keeps the rest") {
    val out = Dedup.chunkDedup(chunkDocs, "text", "doc_id", chunkChars = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_chunks"),
          r.getAs[Long]("n_dropped")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), "one row per input doc")
    // exact duplicates dedup to nothing — BOTH copies ("cc" is a
    // partial tail chunk and is still chunk-identical across the pair)
    assert(out(1L) == (("", 3L, 3L)))
    assert(out(2L) == (("", 3L, 3L)))
    assert(out(3L) == (("ddddeeee", 2L, 0L)))
    // only the aligned shared chunk goes; the unique tail survives
    assert(out(4L) == (("zzzz", 2L, 1L)))
    assert(out(5L) == (("", 0L, 0L)))
  }

  test("chunkDedup maxDf: chunks at or under the cap survive") {
    // "aaaa" occurs 3x (docs 1, 2, 4) — over a maxDf=2 cap; "bbbb" and
    // "cc" occur twice — at the cap, so they stay
    val out = Dedup.chunkDedup(chunkDocs, "text", "doc_id",
        chunkChars = 4, maxDf = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("clean_text")).toMap
    assert(out(1L) == "bbbbcc")
    assert(out(2L) == "bbbbcc")
    assert(out(4L) == "zzzz")
  }

  private def mixDocs = {
    import spark.implicits._
    ((0 until 90).map(i => (i.toLong, "big")) ++
      (90 until 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
  }

  test("temperatureMix: rarest source kept whole, larger ones at sqrt rate") {
    val out = Curation.temperatureMix(mixDocs, "source", "doc_id").collect()
    assert(out.length == 100, "one row per input doc (keep is a flag)")
    val rates = out.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("rate_bp")).toMap
    assert(rates("small") == 10000L, "min stratum rate = sqrt(1) = 1")
    // floor(sqrt(10/90) * 10000) = floor(3333.33) = 3333
    assert(rates("big") == 3333L)
    out.foreach { r =>
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Long]("bucket") < r.getAs[Long]("rate_bp")))
    }
    // deterministic: a re-run keeps the identical document set
    val again = Curation.temperatureMix(mixDocs, "source", "doc_id")
      .where(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val first = out.filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again == first)
  }

  test("temperatureMix alpha=1 is the natural distribution (all kept)") {
    val out = Curation.temperatureMix(mixDocs, "source", "doc_id", alpha = 1.0)
    assert(out.where(!col("keep")).count() == 0)
    assert(out.select("rate_bp").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(10000L))
  }

  test("groupCentroidCosine: known centroids give known cosines") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(1.0f, 0.0f)), // centroid (1, 0)
      ("b", Seq(0.0f, 2.0f)),                         // centroid (0, 2)
      ("c", Seq(3.0f, 3.0f))                          // centroid (3, 3)
    ).toDF("source", "embedding")
    val out = Similarity.groupCentroidCosine(df, "source")
      .collect().map(r =>
        (r.getAs[String]("ga"), r.getAs[String]("gb")) ->
          r.getAs[Double]("cosine")).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")),
      "unordered pairs, ga < gb")
    assert(out(("a", "b")) == 0.0)
    assert(out(("a", "c")) == 0.7071) // 1/sqrt(2) to 4 dp
    assert(out(("b", "c")) == 0.7071)
  }
}
