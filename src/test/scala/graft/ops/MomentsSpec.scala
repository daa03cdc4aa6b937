package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Covariance aggregator semantics: hand-checked values, merge
  * associativity (the map-side-combine contract), and symmetry.
  */
class MomentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("covariance matches the direct population formula") {
    import spark.implicits._
    val dims = 3
    val vecs = Seq(
      Seq(1.0, 2.0, 0.5), Seq(2.0, 1.0, 0.5),
      Seq(3.0, 4.0, 0.5), Seq(0.0, -1.0, 0.5))
    val agg = udaf(new Moments.CovarianceAgg(dims),
      ExpressionEncoder[Seq[Double]]())
    // repartition so reduce+merge both exercise (4 rows, 4 partitions)
    val got = vecs.toDF("v").repartition(4)
      .agg(agg(col("v")).as("c")).collect().head.getSeq[Double](0)
    val n = vecs.length.toDouble
    def mean(i: Int) = vecs.map(_(i)).sum / n
    def cov(i: Int, j: Int) =
      round6(vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j))
    for (i <- 0 until dims; j <- 0 until dims)
      assert(got(i * dims + j) == cov(i, j), s"cov($i,$j)")
    // constant dimension: zero variance and zero cross-covariance
    assert(got(2 * dims + 2) == 0.0)
    assert(got(2 * dims + 0) == 0.0 && got(0 * dims + 2) == 0.0)
    // symmetry of the expanded matrix
    for (i <- 0 until dims; j <- 0 until dims)
      assert(got(i * dims + j) == got(j * dims + i))
  }

  test("power iteration converges toward the dominant eigenvector") {
    // diag(2, 1): dominant axis is e0; from the symmetric start the
    // 3-round iterate lands at (0.992278, 0.124035) — hand-checked
    val cov = Seq(2.0, 0.0, 0.0, 1.0)
    val v = Moments.topComponent(cov, dims = 2, iters = 3)
    assert(v == Seq(0.992278, 0.124035), v.toString)
    // deterministic: same input, same output
    assert(Moments.topComponent(cov, 2, 3) == v)
    // more rounds converge further
    val v10 = Moments.topComponent(cov, 2, 10)
    assert(v10.head > v.head && v10.head <= 1.0)
  }

  test("a wrong-width vector fails loudly, not silently") {
    import spark.implicits._
    val agg = udaf(new Moments.CovarianceAgg(3),
      ExpressionEncoder[Seq[Double]]())
    val ex = intercept[Exception] {
      Seq(Seq(1.0, 2.0)).toDF("v").agg(agg(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
