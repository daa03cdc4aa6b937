package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ProfileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("profile: nulls, null-excluding distincts, string-cast ranges") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), 10),
      (2L, None, 20),
      (3L, Some("a"), 10),
      (4L, Some("a"), 30))
      .toDF("id", "s", "v")
    val got = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    // count(DISTINCT) excludes the null; min/max skip it too
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    assert(got("v") == ((4L, 0L, 3L, "10", "30")))
    // approx mode runs the same shape (values sketch-approximate)
    val approx = Profile.profile(df, Seq("s"), exact = false)
      .collect().head
    assert(approx.getLong(3) >= 1L)
    // unknown column fails loudly
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("nope"))
    }
  }

  test("profile melts through one generator — single source pass, no Union") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id", "s")).queryExecution.optimizedPlan
    // the documented one-pass shape: the table is scanned exactly once
    // (multi-column exact distinct legitimately plans Expand + a
    // two-level Aggregate over that one scan) and the melt is a
    // Generate, not a per-column Union of agg branches
    val leaves = plan.collectLeaves().size
    val unions = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.size
    assert(leaves == 1 && unions == 0,
      s"expected 1 source leaf and no Union, got $leaves leaves / $unions unions:\n$plan")
  }
}
