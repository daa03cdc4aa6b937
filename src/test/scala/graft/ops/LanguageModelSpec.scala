package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hand-computed add-k bigram LM scores on a tiny corpus (the oracle
  * gate proves engine-equivalence; this pins the formula itself).
  */
class LanguageModelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bigramLogProb: add-k formula on a hand-checked corpus") {
    import spark.implicits._
    // unigrams: a=3, b=3, c=1 (V=3); bigrams: (a,b)=3, (b,a)=1
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = LanguageModel.bigramLogProb(df, "text", "doc_id", k = 0.5)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), Option(r.get(2)).map(_ => r.getAs[Double]("avg_logp")))))
      .toMap
    val pAB = math.log((3 + 0.5) / (3 + 0.5 * 3)) // P(b|a)
    val pBA = math.log((1 + 0.5) / (3 + 0.5 * 3)) // P(a|b)
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2.contains(round4((2 * pAB + pBA) / 3)))
    assert(out(2L) == ((1L, Some(round4(pAB)))))
    // a 1-token document has no transitions: count 0, NULL score
    assert(out(3L) == ((0L, None)))
  }

  test("bigramLogProb: corpus-typical documents outscore divergent ones") {
    import spark.implicits._
    // doc 9's bigrams are rare transitions; every other doc repeats
    // the dominant (x,y) pattern — the LM must rank doc 9 last
    val docs = (0L until 9L).map(i => (i, "x y x y x y")) :+
      ((9L, "y x q r"))
    val out = LanguageModel.bigramLogProb(docs.toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("avg_logp"))
      .toMap
    val divergent = out(9L)
    (0L until 9L).foreach(i => assert(out(i) > divergent))
  }

  test("perplexityBuckets: tertile order statistics over the sample") {
    import spark.implicits._
    // 9 docs repeat the dominant transition (high score), one is
    // divergent (low), one is unscorable; sample = all scorable docs
    val docs = ((0L until 9L).map(i => (i, "x y x y x y")) :+
      ((9L, "y x q r")) :+ ((10L, "solo"))).toDF("doc_id", "text")
    val out = LanguageModel.perplexityBuckets(docs, "text", "doc_id",
        sampleBp = 10000)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket"))
      .toMap
    // ascending sample: 1 low + 9 tied highs; t1 = s(4), t2 = s(7) are
    // both the high score, so the divergent doc lands below t1
    assert(out(9L) == "tail")
    (0L until 9L).foreach(i => assert(out(i) == "head", s"doc $i: ${out(i)}"))
    assert(out(10L) == "unscored")
  }

  test("perplexityBuckets: distinct scores split one per tertile") {
    import spark.implicits._
    // three scorable docs with three distinct avg scores: ascending
    // sample s(1) < s(2) < s(3); t1 = s(1), t2 = s(2) ⇒ exactly one
    // doc per bucket, and the best score is the head
    val docs = Seq(
      (0L, "x y x y x y x y"), // all dominant transitions
      (1L, "x y x y q r"),     // mixed
      (2L, "q r s t"))         // all rare
      .toDF("doc_id", "text")
    val out = LanguageModel.perplexityBuckets(docs, "text", "doc_id",
        sampleBp = 10000)
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Double]("avg_logp"), r.getAs[String]("bucket")))
    val byBucket = out.map(t => t._3 -> t._1).toMap
    assert(byBucket == Map("head" -> 0L, "middle" -> 1L, "tail" -> 2L),
      out.mkString(", "))
    assert(out.maxBy(_._2)._3 == "head")
  }

  test("bigramLogProb: empty and whitespace-only text is total") {
    import spark.implicits._
    val out = LanguageModel.bigramLogProb(
        Seq((1L, ""), (2L, "  "), (3L, "a a")).toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_bigrams"))
      .toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }
}
