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

  test("gate-corpus top-5 users all clear the heavy-hitter support") {
    // sketch_topk_items pins in_sketch=TRUE, which is only guaranteed
    // (Misra-Gries no-false-negative) while every top-5 user's
    // frequency exceeds the query's support of 0.002 — the same class
    // of corpus invariant as the token bound below, asserted the same
    // way (sf0.01: 5th-ranked ≈ 0.0083, 4× headroom)
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ev = spark.read.parquet(s"/root/testdata/$sf/events.parquet")
      val total = ev.count().toDouble
      val fifth = ev.groupBy(col("user_id")).count()
        .orderBy(col("count").desc, col("user_id"))
        .limit(5).collect().last.getLong(1).toDouble
      assert(fifth / total > 0.002,
        s"$sf 5th-ranked user frequency ${fifth / total} is at or under " +
          "the sketch_topk_items support 0.002 — the in_sketch=TRUE " +
          "pin would become nondeterministic")
    }
  }

  test("gate-corpus partition sequences stay distinct mod ChecksumMod") {
    // es_psub_deliver's ord_sum pins delivery ORDER exactly only while
    // every partition's sequences are DISTINCT mod ChecksumMod — i.e.
    // max partition sequence (= events routed to that partition − 1)
    // < 10⁶+3. The comment states the bound; this asserts the gate
    // corpus actually satisfies it (the OracleTokenBound discipline).
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ev = spark.read.parquet(s"/root/testdata/$sf/events.parquet")
      // same stream→partition routing as StoreProvider.storeFor
      // (stream_id = "user-<user_id>"), folded per partition over the
      // per-user counts (distinct users are bounded; the event table
      // itself never leaves the executors)
      val maxPerPartition = ev.groupBy(col("user_id")).count().collect()
        .groupBy(r => graft.core.Ids.partitionIdForStream(
          s"user-${r.get(0)}", StoreProvider.NumPartitions))
        .values.map(_.map(_.getLong(1)).sum).max
      assert(maxPerPartition <= SparkEntry.ChecksumMod,
        s"$sf max events/partition $maxPerPartition exceeds ChecksumMod " +
          s"${SparkEntry.ChecksumMod} — two sequences in one partition " +
          "would alias mod the checksum modulus and the ord_sum order " +
          "pin would stop being exact")
    }
  }

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
