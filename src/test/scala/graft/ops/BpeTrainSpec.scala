package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** BPE training against the classic worked example (low/lower/newest/
  * widest, Sennrich et al. §3.2): the merge sequence is known by hand.
  */
class BpeTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // word frequencies: low 5, lower 2, newest 6, widest 3
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" "))
    ).toDF("doc_id", "text")
  }

  test("wordCounts collapses the corpus to its frequency table") {
    val wc = BpeTrain.wordCounts(corpus, "text").collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("c")).toMap
    assert(wc == Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
  }

  test("pairCounts weights adjacent pairs by word frequency") {
    val words = BpeTrain.wordCounts(corpus, "text")
      .select(BpeTrain.charSyms(col("word")).as("syms"), col("c"))
    val pc = BpeTrain.pairCounts(words).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Long]("cnt")).toMap
    // (e,s): newest 6 + widest 3; (l,o): low 5 + lower 2; (w,e): lower 2 + newest 6
    assert(pc(("e", "s")) == 9L)
    assert(pc(("s", "t")) == 9L)
    assert(pc(("l", "o")) == 7L)
    assert(pc(("w", "e")) == 8L)
  }

  test("trainBpe learns the textbook merge sequence") {
    // hand-derived: (e,s)=9 -> es; (es,t)=9 -> est; then (l,o) and
    // (o,w) tie at 7 and (l,o) wins the ascending tie-break; (lo,w)=7
    assert(BpeTrain.trainBpe(corpus, "text", 4) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("trainBpe stops early when every word is one symbol") {
    import spark.implicits._
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // merge 1 fuses (a,b); after that no pairs remain anywhere
    assert(BpeTrain.trainBpe(tiny, "text", 10) == Seq(("a", "b")))
  }
}
