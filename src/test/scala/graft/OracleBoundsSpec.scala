package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the corpus invariants the DuckDB oracles rely on. The
  * LM/classifier/tfidf oracles unroll their token explode to
  * `generate_series(1, SparkEntry.OracleTokenBound)` while the Spark
  * side is unbounded — a fixture document over the bound would
  * truncate the ORACLE only and fail the gate confusingly, so the
  * invariant is asserted here, loudly, against the gate corpus.
  */
class OracleBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("gate-corpus documents stay under the oracle token bound") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = Tables.documents(spark, s"/root/testdata/$sf")
      val maxToks = docs
        .select(size(filter(split(col("text"), " "), t => t =!= ""))
          .as("n"))
        .agg(max(col("n"))).head.getInt(0)
      assert(maxToks <= SparkEntry.OracleTokenBound,
        s"$sf max tokens/doc $maxToks exceeds the oracle's " +
          s"generate_series bound ${SparkEntry.OracleTokenBound} — " +
          "the token-explode oracles would silently truncate")
    }
  }
}
