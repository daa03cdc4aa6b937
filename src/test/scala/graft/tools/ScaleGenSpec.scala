package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The 10× replica must preserve the properties the scale leg's
  * ratios rest on: exact row multiplication, per-replica key
  * uniqueness, and foreign-key consistency across tables (the SAME
  * offset for every key domain).
  */
class ScaleGenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("replicate multiplies rows, keeps keys unique, preserves joins") {
    val d = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val customer = spark.read.parquet(s"$d/customer.parquet")
    val bigO = ScaleGen.replicate(orders, ScaleGen.ScaledKeys("orders"))
    val bigC = ScaleGen.replicate(customer, ScaleGen.ScaledKeys("customer"))
    assert(bigO.count() == orders.count() * ScaleGen.Factor)
    assert(bigC.count() == customer.count() * ScaleGen.Factor)
    // re-keyed primary keys stay unique
    assert(bigO.select("o_orderkey").distinct().count() == bigO.count())
    assert(bigC.select("c_custkey").distinct().count() == bigC.count())
    // FK consistency: every order still finds its customer, and the
    // join multiplies exactly 10×, never cross-replica
    val baseJoin = orders.join(customer,
      orders("o_custkey") === customer("c_custkey")).count()
    val bigJoin = bigO.join(bigC,
      bigO("o_custkey") === bigC("c_custkey")).count()
    assert(bigJoin == baseJoin * ScaleGen.Factor,
      s"join rows $bigJoin != $baseJoin * ${ScaleGen.Factor}")
  }
}
