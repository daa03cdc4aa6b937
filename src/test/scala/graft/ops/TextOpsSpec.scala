package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantic unit tests for the text-pipeline trio the oracle gate
  * checks only end-to-end: PII detection/redaction precedence, BM25
  * ranking, and repetition features (including the short-document
  * defaults an inner join used to silently drop).
  */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("tokenSetOccurrences equals the per-word sum, adjacent tokens included") {
    import spark.implicits._
    val words = graft.ops.Curation.Stopwords
    val df = Seq(
      "the of and the",            // adjacent stop words back-to-back
      "the the the",               // repeated same word adjacent
      "there lathe soothe",        // substrings only — must count 0
      "with that have be to of and the", // the full set once
      "x",                         // none
      "of")                        // single-token document
      .toDF("text")
    val got = df.select(
      TextAnalysis.tokenSetOccurrences(col("text"), words).as("set"),
      words.map(w => TextAnalysis.tokenOccurrences(col("text"), w))
        .reduce(_ + _).as("sum"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(got.map(_.getLong(0)).toSeq == Seq(4L, 3L, 0L, 8L, 0L, 1L))
  }

  test("tokenSetOccurrences equals the per-word sum on random token soups") {
    import spark.implicits._
    // random texts over an alphabet that mixes stop words, words
    // containing them as substrings, and noise — 300 docs, one job
    val words = graft.ops.Curation.Stopwords
    val alphabet = words ++ Seq("there", "lathe", "toward", "offer",
      "xx", "q7", "bethe", "thebe")
    val rnd = new scala.util.Random(42)
    val docs = (1 to 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString(" "))
    }.toDF("id", "text").where(length(col("text")) > 0)
    val cmp = docs.select(
      TextAnalysis.tokenSetOccurrences(col("text"), words).as("set"),
      words.map(w => TextAnalysis.tokenOccurrences(col("text"), w))
        .reduce(_ + _).as("sum"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("PII: email-first precedence, independent raw-text counts") {
    import spark.implicits._
    val rows = Seq(
      // IPv4 inside an email domain: counted by BOTH detectors, but
      // redacted ONCE as [EMAIL] (precedence documented in Pii.scala)
      (1L, "mail user@10.0.0.1.com now"),
      (2L, "call 555-123-4567 or 555-987-6543"),
      (3L, "hosts 10.0.0.1 and 192.168.1.255"),
      (4L, "clean text, no pii at all"),
      // phone digits glued to a word: \b is ASCII, so no match
      (5L, "id555-123-4567x is not a phone"))
      .toDF("id", "text")
    val got = rows.select(col("id"),
        Pii.emailCount(col("text")).as("e"),
        Pii.phoneCount(col("text")).as("p"),
        Pii.ipv4Count(col("text")).as("i"),
        Pii.redact(col("text")).as("red"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1) == ((1L, 0L, 1L, "mail [EMAIL] now")))
    assert(got(2) == ((0L, 2L, 0L, "call [PHONE] or [PHONE]")))
    assert(got(3) == ((0L, 0L, 2L, "hosts [IP] and [IP]")))
    assert(got(4) == ((0L, 0L, 0L, "clean text, no pii at all")))
    assert(got(5)._2 == 0L)
  }

  test("BM25: rarity and saturation behave, ranking is deterministic") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark spark spark spark spark spark spark"),
      (1L, "spark runs on the cluster"),
      (2L, "needle in the corpus"),
      (3L, "nothing relevant here at all"),
      (4L, "plain filler text"),
      (5L, "more filler text")).toDF("doc_id", "text")
    val top = Ranking.bm25TopK(docs, "text", "doc_id", Seq("spark", "needle"),
        topK = 4).collect()
    val byId = top.map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // rare term ("needle", df=1) outscores the common term's single
    // occurrence, and tf saturation keeps the spam doc from scoring
    // 8x doc 1
    assert(byId(2)._1 > byId(1)._1, s"idf should favor the rare term: $byId")
    assert(byId(0)._1 < byId(1)._1 * 3, s"tf must saturate: $byId")
    // zero-match docs never enter the top-k above matching ones
    val ranked = top.sortBy(_.getLong(2)).map(_.getLong(0)).toSeq
    assert(ranked.take(3).toSet == Set(0L, 1L, 2L))
    // deterministic: same input, same full result
    val again = Ranking.bm25TopK(docs, "text", "doc_id", Seq("spark", "needle"),
        topK = 4).collect()
    assert(top.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("BM25 batch == per-query BM25 on every qid slice") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark spark spark spark spark spark spark"),
      (1L, "spark runs on the cluster"),
      (2L, "needle in the corpus"),
      (3L, "nothing relevant here at all"),
      (4L, "plain filler text with needle"),
      (5L, "more filler text")).toDF("doc_id", "text")
    val queries = Seq(0L -> Seq("spark", "needle"), 1L -> Seq("needle"),
      2L -> Seq("spark", "filler"))
    val batch = Ranking.bm25TopKBatch(docs, "text", "doc_id", queries,
        topK = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    queries.foreach { case (qid, terms) =>
      val single = Ranking.bm25TopK(docs, "text", "doc_id", terms,
          topK = 4)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val slice = batch(qid).map(t => (t._2, t._3, t._4)).toSet
      assert(slice == single, s"qid=$qid slice=$slice single=$single")
    }
  }

  test("repetition: boilerplate scores high, short docs keep defaults") {
    import spark.implicits._
    val docs = Seq(
      (0L, "buy now buy now buy now buy now"),
      (1L, "a varied document with no repeated phrasing inside"),
      (2L, "tiny doc"), // one bigram, zero trigrams
      (3L, "word"))     // no bigrams at all
      .toDF("doc_id", "text")
    val got = Repetition.repetitionFeatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // every input doc survives — no inner-join drops
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    val spam = got(0)
    assert(spam._1 == "buy now" && spam._2 == 4L)
    assert(spam._3 > 0.9, s"spam doc should be bigram-covered: $spam")
    assert(spam._4 == 1.0, s"all spam trigrams are duplicates: $spam")
    assert(got(1)._4 == 0.0, "varied doc has no duplicate trigrams")
    assert(got(2) == (("tiny doc", 1L, got(2)._3, 0.0)))
    assert(got(3) == (("", 0L, 0.0, 0.0)))
  }

  test("tfIdfTopTerms: shared terms score 0, rare repeats rank first") {
    import spark.implicits._
    // 'the' appears in every doc (idf 0); 'rare' only in doc 0,
    // repeated twice (tf 2 · ln 3); 'mid' in two docs (ln 1.5)
    val df = Seq(
      (0L, "the rare rare mid"),
      (1L, "the mid x"),
      (2L, "the y z"))
      .toDF("doc_id", "text")
    val got = Ranking.tfIdfTopTerms(df, "text", "doc_id", topK = 2)
      .select(col("id"), col("rk").cast("long").as("rk"), col("term"),
        col("tfidf"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getDouble(3)))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((0L, 1L)) == (("rare", r6(2 * math.log(3.0)))))
    assert(got((0L, 2L)) == (("mid", r6(math.log(1.5)))))
    // doc 1: x (ln 3) beats mid (ln 1.5); the every-doc 'the' scores 0
    assert(got((1L, 1L))._1 == "x" && got((1L, 2L))._1 == "mid")
    // doc 2: y and z tie at ln 3 — rank breaks on the term string
    assert(got((2L, 1L))._1 == "y" && got((2L, 2L))._1 == "z")
  }

  test("invertedIndex: df/cf exact, postings bounded at the k smallest ids") {
    import spark.implicits._
    val df = Seq(
      (3L, "the cat"),
      (1L, "the the dog"),
      (2L, "the fish"),
      (4L, "the bird"))
      .toDF("doc_id", "text")
    val got = Ranking.invertedIndex(df, "text", "doc_id", postK = 2)
      .select(col("term"), col("df_t"), col("cf"),
        col("rk").cast("long").as("rk"), col("id"), col("tf"))
      .collect()
      .map(r => (r.getString(0), r.getLong(3)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    // 'the': df 4, cf 5 (doubled in doc 1), postings CAPPED at the 2
    // smallest doc ids — docs 3 and 4 never appear
    assert(got(("the", 1L)) == ((4L, 5L, 1L, 2L)))
    assert(got(("the", 2L)) == ((4L, 5L, 2L, 1L)))
    assert(!got.contains(("the", 3L)))
    assert(got(("cat", 1L)) == ((1L, 1L, 3L, 1L)))
    assert(got.size == 2 + 4) // 'the' x2 + four singleton terms
  }

  test("charEntropy: hand-checked values, multibyte chars, empty text") {
    import spark.implicits._
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(
      (0L, "aaaa"),     // single symbol: entropy 0 (and +0.0, not -0.0)
      (1L, "abab"),     // two equiprobable: ln 2
      (2L, "abcd"),     // four equiprobable: ln 4
      (3L, "aab"),      // 2/3, 1/3 split
      (4L, "日本語日本語"), // multibyte chars count as single symbols
      (5L, ""))         // empty: 0 by the guard
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.charEntropy(col("text")).as("e"),
        TextAnalysis.distinctChars(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    assert(got(0L) == ((0.0, 1L)))
    assert(java.lang.Double.doubleToRawLongBits(got(0L)._1) == 0L,
      "entropy of a constant string must be +0.0, not -0.0")
    assert(got(1L) == ((round4(math.log(2)), 2L)))
    assert(got(2L) == ((round4(math.log(4)), 4L)))
    val h3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(got(3L) == ((round4(h3), 2L)))
    assert(got(4L) == ((round4(math.log(3)), 3L)),
      "multibyte text must slice per character, not per byte")
    assert(got(5L) == ((0.0, 0L)))
    // NULL text propagates NULL (standard SQL, matching the oracle's
    // CASE) — it does NOT collapse to the empty-text 0
    val nullRow = Seq((6L, null: String)).toDF("doc_id", "text")
      .select(TextAnalysis.charEntropy(col("text")).as("e"),
        TextAnalysis.distinctChars(col("text")).as("k"))
      .collect().head
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1))
  }
}
