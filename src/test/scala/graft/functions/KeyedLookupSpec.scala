package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** `functions.keyedLookup` must give identical answers on both of its
  * compilation paths (CASE chain below the threshold, single map
  * literal above it), and the large path must keep the plan small —
  * the reference runs 50k+ partitions (`docs/partitions.md`), so a
  * watermark clamp that grows two plan nodes per partition is a
  * 100k-node filter the optimizer re-walks on every rule pass.
  */
class KeyedLookupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def check(table: Map[Int, Long], probes: Seq[Int]): Unit = {
    import spark.implicits._
    val out = probes.toDF("k")
      .withColumn("v", functions.keyedLookup(table, col("k"), -1L))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      assert(out(p) == table.getOrElse(p, -1L), s"key $p")
    }
  }

  test("small table (CASE-chain path): hits and default") {
    val table = (0 until 8).map(i => i -> (i * 100L)).toMap
    check(table, -2 until 12)
  }

  test("large table (map-literal path): hits and default") {
    assert(functions.KeyedLookupWhenMax < 1000)
    val table = (0 until 1000).map(i => i * 3 -> (i * 7L)).toMap
    check(table, -3 until 3010 by 13)
  }

  test("both paths agree at the threshold boundary") {
    import spark.implicits._
    // tables exactly at and just over the threshold exercise the CASE
    // chain and the map literal on the same probe set
    val at = (0 until functions.KeyedLookupWhenMax).map(i => i -> (i * 5L)).toMap
    val over = (0 to functions.KeyedLookupWhenMax).map(i => i -> (i * 5L)).toMap
    val probes = (-1 to functions.KeyedLookupWhenMax + 1).toDF("k")
    val both = probes
      .withColumn("chain", functions.keyedLookup(at, col("k"), Long.MinValue))
      .withColumn("lit", functions.keyedLookup(over, col("k"), Long.MinValue))
      .collect()
    both.foreach { r =>
      val k = r.getInt(0)
      assert(r.getLong(1) == at.getOrElse(k, Long.MinValue))
      assert(r.getLong(2) == over.getOrElse(k, Long.MinValue))
    }
  }

  test("string keys (subscription head maps)") {
    import spark.implicits._
    val table = (0 until 300).map(i => s"pk$i:s$i" -> i.toLong).toMap
    val out = (0 until 350).map(i => s"pk$i:s$i").toDF("k")
      .withColumn("v", functions.keyedLookup(table, col("k"), -7L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 350).foreach { i =>
      assert(out(s"pk$i:s$i") == table.getOrElse(s"pk$i:s$i", -7L))
    }
  }

  test("large path keeps the plan O(1): expression stays tiny") {
    import spark.implicits._
    val big = (0 until 5000).map(i => i -> i.toLong).toMap
    val df = (0 until 10).toDF("k")
      .withColumn("v", functions.keyedLookup(big, col("k"), -1L))
    // a CASE chain over 5000 entries would render >5000 WHEN branches;
    // the map-literal path must not scale the TREE with the table.
    // (The literal's VALUE is big; the node count is what the
    // optimizer walks.)
    val tree = df.queryExecution.analyzed.expressions
      .map(_.collect { case e => e }.size).sum
    assert(tree < 100, s"expression tree has $tree nodes")
    val vals = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 10).foreach(i => assert(vals(i) == i.toLong))
  }
}
