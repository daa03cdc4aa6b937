package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class TopKPerKeySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("custom exec matches window row_number semantics exactly") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")

    val custom = TopK.topKPerKey(
      orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect().map(_.toSeq).toSeq

    val viaWindow = orders
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .where(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect().map(_.toSeq).toSeq

    assert(custom.nonEmpty)
    assert(custom == viaWindow)
  }

  test("physical plan is two-phase: partial heaps, one hash exchange, final heaps") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    val df = TopK.topKPerKey(
      orders, Seq("o_custkey"), Seq(col("o_totalprice").desc), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.toLowerCase.contains("sortexec"), plan)
    assert(df.count() > 0)
    // partial pass BELOW the exchange, final above — the shuffle must
    // carry only per-partition top-k survivors, never the full input
    val ops = graft.PlanTestHelpers.physicalOps(df)
    val execs = ops.collect { case t: TopKPerKeyExec => t.partial }
    assert(execs.sorted == Seq(false, true), s"expected final+partial: $execs")
    val exchangeAbovePartial = ops.exists {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        graft.PlanTestHelpers.flattenPlan(e.child).exists {
          case t: TopKPerKeyExec => t.partial
          case _ => false
        }
      case _ => false
    }
    assert(exchangeAbovePartial, df.queryExecution.executedPlan.toString)
  }

  test("k larger than any group returns everything") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    val df = TopK.topKPerKey(
      orders, Seq("o_custkey"), Seq(col("o_orderkey").asc), 1000000)
    assert(df.count() == orders.count())
  }

  test("rankCol emits window-identical ranks with no Window operator") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")

    val custom = TopK.topKPerKey(
      orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3,
      rankCol = Some("rk"))
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")

    val plan = custom.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("window"), plan)

    val got = custom.orderBy("o_custkey", "rk")
      .collect().map(_.toSeq).toSeq
    val viaWindow = orders
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .where(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rk").cast("long"))
      .orderBy("o_custkey", "rk")
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got == viaWindow)
  }

  test("partial-pass row-budget fallback keeps results exact") {
    // force the fallback: a tiny budget means the partial pass admits
    // only the first few keys to heaps and passes every other row
    // through unpruned — the final pass must still prune exactly
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    spark.conf.set("graft.topk.partialRowBudget", "8")
    try {
      val fellBack = TopK.topKPerKey(
        orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
        .collect().map(_.toSeq).toSeq
      val viaWindow = orders
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .where(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
        .collect().map(_.toSeq).toSeq
      assert(fellBack.nonEmpty)
      assert(fellBack == viaWindow)
    } finally spark.conf.unset("graft.topk.partialRowBudget")
  }

  test("rankCol shadowing an input column is rejected up front") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    // emitting a second attribute named o_orderkey would make every
    // downstream reference ambiguous — the API must refuse, not emit
    val ex = intercept[IllegalArgumentException] {
      TopK.topKPerKey(orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc), 3, rankCol = Some("o_orderkey"))
    }
    assert(ex.getMessage.contains("o_orderkey"))
    // a fresh name on the same inputs still works
    assert(TopK.topKPerKey(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3,
      rankCol = Some("rk")).columns.contains("rk"))
  }
}
