package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The codegen'd vector/hash expressions must be value-identical to
  * the higher-order-function formulations they replace — every oracle
  * hash in CORRECTNESS depends on bit-stable equivalence.
  */
class VecExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("spark ascii semantics probe: multibyte first char") {
    import spark.implicits._
    val r = Seq(("a"), ("€"), ("的"), ("z")).toDF("c")
      .select(col("c"), ascii(col("c")).as("a"))
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    // document what spark's ascii returns for multibyte — the rolling
    // hash helper must reproduce it exactly
    info(s"ascii map: $r")
    assert(r("a") == 97 && r("z") == 122 && r("€") == 8364 && r("的") == 30340)
  }

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("ArrayDotCols ≡ aggregate(zip_with): values, nulls, length mismatch") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    } :+ ((Seq.fill(63)(1.0f), Seq.fill(64)(1.0f))) // length mismatch → null
    val df = rows.toDF("a", "b")
      .withColumn("hof", hofDot(col("a"), col("b")))
      .withColumn("native", vec.dot(col("a"), col("b")))
    df.collect().foreach { r =>
      val h = Option(r.get(2)); val n = Option(r.get(3))
      assert(h == n, s"hof=$h native=$n")
      // bit-identical, not just approximately equal
      h.zip(n).foreach { case (x: Double, y: Double) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y))
      }
    }
    // null element poisons the fold on both paths
    val withNull = Seq((Seq[java.lang.Float](1.0f, null, 3.0f),
      Seq[java.lang.Float](1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .withColumn("hof", hofDot(col("a"), col("b")))
      .withColumn("native", vec.dot(col("a"), col("b")))
      .head()
    assert(withNull.isNullAt(2) && withNull.isNullAt(3))
  }

  test("ArrayDotLit ≡ zip_with against typedLit weights; double arrays too") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val w = Seq.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val dfF = (0 until 100).map(_ => Tuple1(Seq.fill(64)(rnd.nextFloat()))).toDF("v")
    val dfD = (0 until 100).map(_ => Tuple1(Seq.fill(64)(rnd.nextDouble()))).toDF("v")
    for (df <- Seq(dfF, dfD)) {
      val out = df
        .withColumn("hof", aggregate(
          zip_with(col("v"), typedLit(w), (x, wt) => x.cast("double") * wt),
          lit(0.0), (acc, x) => acc + x))
        .withColumn("native", vec.dotLit(col("v"), w))
        .collect()
      out.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
      }
    }
    // length mismatch → null (zip_with pads with null)
    val mm = Seq(Tuple1(Seq.fill(10)(1.0))).toDF("v")
      .withColumn("native", vec.dotLit(col("v"), w)).head()
    assert(mm.isNullAt(1))
  }

  test("RollingHashExpr ≡ HOF formulation incl. multibyte and >maxLen text") {
    import spark.implicits._
    import graft.ops.TextAnalysis.{powTable, HashMod, MaxHashLen}
    val pows = typedLit(powTable)
    def hof(text: Column): Column = aggregate(
      sequence(lit(1), least(length(text), lit(MaxHashLen))),
      lit(0L),
      (acc, i) => acc + ascii(text.substr(i, lit(1))) * element_at(pows, i)
    ) % HashMod
    val rnd = new scala.util.Random(99)
    val texts = Seq(
      "a", "hello world", "The quick brown fox.",
      "der und die das ist €42 的是了在我",
      rnd.alphanumeric.take(2000).mkString, // beyond MaxHashLen
      (0 until 500).map(_ => "的是了").mkString(" "))
    val out = texts.toDF("t")
      .withColumn("hof", hof(col("t")))
      .withColumn("native", vec.rollingHash(col("t"), powTable, HashMod))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"text=${r.getString(0).take(40)}")
    }
  }

  test("byteSumRange equals the HOF byte fold, including out-of-range") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val payload = Array.fill(64)(rnd.nextInt(256).toByte)
    // (off, len) cases: full, interior, zero-len, tail-clipped, past-end
    val cases = Seq((0L, 64L), (10L, 20L), (5L, 0L), (50L, 30L), (100L, 8L))
    val df = cases.toDF("off", "len").withColumn("bin", lit(payload))
    // sequence(1, 0) yields a DESCENDING array (the repo-wide gotcha),
    // so the HOF formulation — like the decoders that used it — only
    // ever ran with len > 0; mirror that guard here
    val hof = when(col("len") > 0, aggregate(
      sequence(lit(1L), col("len")),
      lit(0L),
      (acc, i) => acc + conv(hex(substring(col("bin"),
        (col("off") + i).cast("int"), lit(1))), 16, 10).cast("long")))
      .otherwise(lit(0L))
    val out = df
      .withColumn("h", hof)
      .withColumn("n", graft.functions.vec.byteSumRange(col("bin"), col("off"), col("len")))
      .collect()
    out.foreach { r =>
      val hi = r.fieldIndex("h")
      val ni = r.fieldIndex("n")
      assert(r.isNullAt(hi) == r.isNullAt(ni),
        s"null mismatch off=${r.getLong(0)} len=${r.getLong(1)}")
      if (!r.isNullAt(hi))
        assert(r.getLong(hi) == r.getLong(ni),
          s"off=${r.getLong(0)} len=${r.getLong(1)}")
    }
  }

  test("CharEntropyExpr ≡ sorted-distinct HOF fold, incl. multibyte") {
    import spark.implicits._
    // reference: fold -(k/n)·ln(k/n) over distinct chars in ascending
    // order — exactly the formulation the native pass replaced
    def ref(s: String): Double = {
      if (s.isEmpty) return 0.0
      val cps = s.codePoints().toArray.toSeq
      val counts = cps.groupBy(identity).map { case (c, g) => c -> g.size }
      val acc = counts.toSeq.sortBy(_._1).map { case (_, k) =>
        val p = k.toDouble / cps.size; p * math.log(p)
      }.sum
      if (acc == 0.0) 0.0 else -acc
    }
    val samples = Seq("", "a", "aaaa", "abab", "abcd", "日本語日本語",
      "mixed 日本 ascii", "x y x y q r")
    val got = samples.toDF("t")
      .select(graft.functions.vec.charEntropy(col("t")).as("e"),
        graft.functions.vec.distinctChars(col("t")).as("k"))
      .collect()
    samples.zip(got).foreach { case (s, r) =>
      assert(r.getDouble(0) == ref(s), s"entropy('$s')")
      assert(r.getLong(1) == s.codePoints().distinct().count(),
        s"distinct('$s')")
    }
    // positive zero, bit-exact
    val z = Seq("aaaa").toDF("t")
      .select(graft.functions.vec.charEntropy(col("t"))).head.getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(z) == 0L)
  }

  test("native expressions stay inside WholeStageCodegen") {
    val df = spark.range(10)
      .withColumn("v", array((0 until 8).map(_ => col("id").cast("float")): _*))
      .withColumn("t", concat(lit("doc "), col("id")))
      .withColumn("d", vec.dotLit(col("v"), Seq.fill(8)(1.0)))
      .withColumn("h", vec.rollingHash(col("t"),
        graft.ops.TextAnalysis.powTable, graft.ops.TextAnalysis.HashMod))
      .withColumn("e", vec.charEntropy(col("t")))
      .withColumn("k", vec.distinctChars(col("t")))
      .withColumn("w", size(vec.winnow(col("t"), 2, 2)))
      .where(col("d") > -1 && col("h") >= 0 && col("e") >= 0 &&
        col("k") >= 0 && col("w") >= 0)
    // `*(n)` is how a WholeStageCodegen span renders in the simple plan
    // string; the native expressions must sit INSIDE one, not fall back
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("arraydotlit"), plan)
    df.collect() // and the generated code actually compiles + runs
  }
}
