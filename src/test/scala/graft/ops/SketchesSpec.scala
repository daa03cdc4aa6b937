package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("topKItemsGate: exact top-k with deterministic tie order, sketch flag TRUE above support") {
    import spark.implicits._
    // a: 5, b: 4, c: 3, d/e tie at 2 — tie at the k=4 boundary breaks
    // on the value, so d wins the last slot
    val df = (Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(2)("d") ++ Seq.fill(2)("e") ++ Seq("f"))
      .toDF("v")
    val got = Sketches.topKItemsGate(df, "v", k = 4, support = 0.05)
      .orderBy(col("n").desc, col("v"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", 5L), ("b", 4L), ("c", 3L), ("d", 2L)))
    // every top item clears support (1/17 > 0.05... a..d all >= 2/17)
    // => Misra-Gries no-false-negative guarantee => flag TRUE
    assert(got.forall(_._3), s"sketch lost a true heavy hitter: ${got.toSeq}")
    // ...and the gate SAYS SO: above_support certifies the
    // no-false-negative precondition held for each emitted item
    assert(got.forall(_._4), s"top item under support: ${got.toSeq}")
  }

  test("topKItemsGate: an under-support top item fails LOUDLY via above_support") {
    import spark.implicits._
    // c has 1/21 < support 0.1: its in_sketch value is whatever the
    // sketch happened to keep (no guarantee either way below support)
    // — above_support=false is the deterministic signal that the
    // guarantee did not apply, instead of an opaque flag flip
    val df = (Seq.fill(12)("a") ++ Seq.fill(8)("b") ++ Seq("c")).toDF("v")
    val got = Sketches.topKItemsGate(df, "v", k = 3, support = 0.1)
      .orderBy(col("n").desc, col("v"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(got.toSeq == Seq(("a", 12L, true), ("b", 8L, true),
      ("c", 1L, false)))
  }
}
