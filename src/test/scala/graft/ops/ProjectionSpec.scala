package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Random-projection semantics: the seeded sign matrix is the md5
  * derivation (so any engine reproduces it), basis vectors read off
  * matrix columns, and under-length vectors poison with null instead
  * of silently truncating.
  */
class ProjectionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("sign matrix matches the md5 derivation and is balanced-ish") {
    val m = Projection.signMatrix(16, 64, "rp")
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(s => s == 1.0 || s == -1.0))
    // unbiased coin: the 1024-flip count stays within 5 sigma of half
    val pos = m.flatten.count(_ == 1.0)
    assert(math.abs(pos - 512) < 5 * 16, s"suspicious sign bias: $pos/1024")
    // spot-check one entry against a direct md5 computation
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("rp:3:7".getBytes("UTF-8"))
    val expect = if (f"${md(0) & 0xff}%02x".charAt(0) >= '8') 1.0 else -1.0
    assert(m(3)(7) == expect)
  }

  test("projecting a basis vector reads off a matrix column / sqrt(outDims)") {
    import spark.implicits._
    val dims = 8
    val e2 = Array.tabulate(dims)(i => if (i == 2) 1.0f else 0.0f)
    val df = Seq((1L, e2.toSeq)).toDF("vec_id", "embedding")
    val got = Projection.randomProjection(df, "vec_id", "embedding",
        inDims = dims, outDims = 4, seed = "rp")
      .collect().head.getSeq[Double](1)
    val m = Projection.signMatrix(4, dims, "rp")
    val expect = (0 until 4).map(j => m(j)(2) / math.sqrt(4.0))
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("length mismatch poisons the row with nulls, never truncates") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val got = Projection.randomProjection(df, "vec_id", "embedding",
        inDims = 8, outDims = 2)
      .collect().head.getSeq[Any](1)
    assert(got.forall(_ == null), s"expected all-null projection: $got")
  }
}
