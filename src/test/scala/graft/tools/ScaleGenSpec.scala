package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The 10× replica must preserve the properties the scale leg's
  * ratios rest on: exact row multiplication, per-replica key
  * uniqueness, and foreign-key consistency across tables (the SAME
  * offset for every key domain).
  */
class ScaleGenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("replicate multiplies rows, keeps keys unique, preserves joins") {
    val d = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val customer = spark.read.parquet(s"$d/customer.parquet")
    val bigO = ScaleGen.replicate(orders, ScaleGen.ScaledKeys("orders"))
    val bigC = ScaleGen.replicate(customer, ScaleGen.ScaledKeys("customer"))
    assert(bigO.count() == orders.count() * ScaleGen.Factor)
    assert(bigC.count() == customer.count() * ScaleGen.Factor)
    // re-keyed primary keys stay unique
    assert(bigO.select("o_orderkey").distinct().count() == bigO.count())
    assert(bigC.select("c_custkey").distinct().count() == bigC.count())
    // FK consistency: every order still finds its customer, and the
    // join multiplies exactly 10×, never cross-replica
    val baseJoin = orders.join(customer,
      orders("o_custkey") === customer("c_custkey")).count()
    val bigJoin = bigO.join(bigC,
      bigO("o_custkey") === bigC("c_custkey")).count()
    assert(bigJoin == baseJoin * ScaleGen.Factor,
      s"join rows $bigJoin != $baseJoin * ${ScaleGen.Factor}")
  }

  test("text mutation isolates replicas but preserves intra-replica structure") {
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val big = ScaleGen.replicate(docs, ScaleGen.ScaledKeys("documents"),
      mutateText = Some("text"))
    assert(big.count() == docs.count() * ScaleGen.Factor)
    // no replica copy is an exact duplicate of another: every text is
    // distinct exactly as often as in 10 independent base corpora
    val baseDistinct = docs.select("text").distinct().count()
    assert(big.select("text").distinct().count() ==
      baseDistinct * ScaleGen.Factor)
    // cross-replica shingle overlap is confined to shingles made
    // ENTIRELY of whitelist tokens (stopwords/lang markers keep their
    // surface form so quality/langid statistics survive) — any shingle
    // containing a content token is replica-tagged, so the shared
    // slice is a vanishing fraction of the shingle space
    def shingles(df: org.apache.spark.sql.DataFrame, lo: Long, hi: Long) =
      graft.ops.Dedup.wordShingles(
        df.where(col("doc_id") >= lo && col("doc_id") < hi), "text", "doc_id", 3)
        .select("sh").distinct()
    val r0 = shingles(big, 0L, ScaleGen.KeyOffset)
    val r1 = shingles(big, ScaleGen.KeyOffset, 2 * ScaleGen.KeyOffset)
    assert(r0.count() > 0 && r1.count() > 0)
    val whitelist = ScaleGen.PreservedTokens.toSet
    val shared = r0.intersect(r1).collect().map(_.getString(0))
    shared.foreach { sh =>
      assert(sh.split(" ").forall(whitelist), s"non-whitelist shingle shared: $sh")
    }
    val baseShingles = graft.ops.Dedup.wordShingles(docs, "text", "doc_id", 3)
      .select("sh").distinct().count()
    assert(shared.length <= baseShingles / 100,
      s"${shared.length} shared shingles vs $baseShingles base — overlap not vanishing")
    // intra-replica structure is the base corpus's, mapped 1:1: the
    // mutation is content-keyed (same token -> same mutated form), so
    // the per-replica distinct-shingle count matches base up to the
    // unconditional first-token prefix (at most one extra shingle
    // form per document)
    val nDocs = docs.count()
    assert(r1.count() >= baseShingles && r1.count() <= baseShingles + nDocs,
      s"${r1.count()} outside [$baseShingles, ${baseShingles + nDocs}]")
    // the signals the mutation now preserves: per-replica stopword
    // mass and langid distribution match base (up to first-token hits)
    val baseStops = docs.select(sum(graft.ops.TextAnalysis
      .tokenSetOccurrences(col("text"), graft.ops.Curation.Stopwords))).first().getLong(0)
    val r1Stops = big.where(col("doc_id") >= ScaleGen.KeyOffset &&
        col("doc_id") < 2 * ScaleGen.KeyOffset)
      .select(sum(graft.ops.TextAnalysis
        .tokenSetOccurrences(col("text"), graft.ops.Curation.Stopwords)))
      .first().getLong(0)
    assert(r1Stops >= baseStops - nDocs && r1Stops <= baseStops,
      s"replica stopword mass $r1Stops vs base $baseStops (docs=$nDocs)")
  }

  test("ensure10x generates via temp+rename, marks complete, and caches") {
    val d = "/root/testdata/sf0.001"
    val dst = ScaleGen.ensure10x(spark, d)
    assert(new java.io.File(dst, "_COMPLETE").exists())
    // no abandoned temp tree left behind
    val parent = new java.io.File(dst).getParentFile
    assert(!parent.listFiles().exists(_.getName
      .startsWith(new java.io.File(dst).getName + ".tmp-")), dst)
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val base = spark.read.parquet(s"$d/documents.parquet")
    assert(docs.count() == base.count() * ScaleGen.Factor)
    // second call is a pure cache hit on the marker
    assert(ScaleGen.ensure10x(spark, d) == dst)
  }

  test("stale-sibling sweep never touches .tmp- trees (live generations)") {
    val d = "/root/testdata/sf0.001"
    val dst = new java.io.File(ScaleGen.ensure10x(spark, d))
    // a sibling that LOOKS like a superseded replica (old mtime, even a
    // _COMPLETE marker) but lives under a .tmp- name is some process's
    // generation tree — a fresh ensure10x must leave it alone
    val liveTmp = new java.io.File(dst.getParentFile,
      dst.getName.replaceAll("-[0-9a-f]{12}$", "-deadbeef0000") + ".tmp-99999")
    val old = new java.io.File(dst.getParentFile,
      dst.getName.replaceAll("-[0-9a-f]{12}$", "-deadbeef0001"))
    try {
      assert(liveTmp.mkdirs() && old.mkdirs())
      java.nio.file.Files.createFile(liveTmp.toPath.resolve("_COMPLETE"))
      java.nio.file.Files.createFile(old.toPath.resolve("_COMPLETE"))
      liveTmp.setLastModified(System.currentTimeMillis() - 3 * 3600 * 1000)
      // the sweep only runs on a cache MISS — drop dst's marker so
      // ensure10x regenerates (sf0.001 is seconds) and sweeps siblings
      java.nio.file.Files.delete(dst.toPath.resolve("_COMPLETE"))
      val again = ScaleGen.ensure10x(spark, d)
      assert(again == dst.toString)
      // the marked, old, NON-tmp sibling was swept...
      assert(!old.exists(), "superseded sibling should be deleted")
      // ...but the .tmp- tree survived untouched
      assert(liveTmp.exists() &&
        new java.io.File(liveTmp, "_COMPLETE").exists(),
        ".tmp- tree must never be swept")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(liveTmp); rm(old)
    }
  }
}
