package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hand-computed Naive-Bayes log-odds on a tiny labeled corpus (the
  * oracle gate proves engine-equivalence; this pins the formula).
  */
class ClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("logOddsScore: hand-checked weights, prior, and predictions") {
    import spark.implicits._
    // pos docs use token a (4×) and shared s (2×); neg uses b (2×), s (1×)
    val df = Seq(
      (0L, "a a s", "p"), (1L, "a a s", "p"),
      (2L, "b b s", "n"),
      (3L, "a b", "p"),   // mixed-token doc, pos label
      (4L, "", "n"))      // token-less doc scores the prior alone
      .toDF("doc_id", "text", "y")
    val out = Classifier.logOddsScore(df, "text", "doc_id",
        positive = col("y") === "p", k = 1.0)
      .collect().map(r => (r.getAs[Long]("id"),
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("log_odds"),
          r.getAs[Boolean]("pred_pos")))).toMap
    // counts: a: c+=5 c-=0; b: c+=1 c-=2; s: c+=2 c-=1
    // T+ = 8, T- = 3, V = 3, N+ = 3, N- = 2
    val (tp, tn, v) = (8.0, 3.0, 3.0)
    def w(cp: Double, cn: Double) =
      math.log((cp + 1) / (tp + v)) - math.log((cn + 1) / (tn + v))
    val prior = math.log(3.0 / 2.0)
    val (wa, wb, ws) = (w(5, 0), w(1, 2), w(2, 1))
    assert(out(0L) == ((3L, round4(prior + 2 * wa + ws), true)))
    assert(out(2L) == ((3L, round4(prior + 2 * wb + ws), false)))
    assert(out(3L) == ((2L, round4(prior + wa + wb),
      round4(prior + wa + wb) > 0.0)))
    assert(out(4L) == ((0L, round4(prior), prior > 0)))
  }

  test("logOddsScore separates classes on a synthetic corpus") {
    import spark.implicits._
    val docs = (0L until 20L).map { i =>
      if (i < 12) (i, "good clean text with useful words here", true)
      else (i, "zz yy xx ww vv uu tt ss", false)
    }.toDF("doc_id", "text", "label")
    val out = Classifier.logOddsScore(docs, "text", "doc_id",
        positive = col("label"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("pred_pos"))
      .toMap
    (0L until 20L).foreach(i =>
      assert(out(i) == (i < 12), s"doc $i misclassified"))
  }
}
