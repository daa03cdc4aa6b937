package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys at 100 TB.
  *
  * AQE's skew-join splitting covers joins; these helpers cover skewed
  * AGGREGATIONS (e.g. exact dedup where one boilerplate document
  * repeats billions of times — its hash becomes one giant reduce
  * group). Two-phase salted aggregation bounds any single task's group
  * size at ~1/saltFactor of the hot key.
  */
object Skew {

  /** Two-phase count/min aggregation over a possibly-skewed key:
    * phase 1 aggregates (key, salt) — spreading a hot key over
    * `saltFactor` tasks — phase 2 merges the partials per key. Result
    * is identical to a direct groupBy(key).
    */
  def saltedDedupCounts(df: DataFrame, keyCol: Column, idCol: Column,
      saltFactor: Int = 64): DataFrame = {
    val salted = df.select(keyCol.as("fp"), idCol.as("id"))
      .withColumn("salt", pmod(hash(col("id")), lit(saltFactor)))
    val partial = salted.groupBy(col("fp"), col("salt"))
      .agg(min(col("id")).as("keeper_p"), count(lit(1)).as("dups_p"))
    partial.groupBy(col("fp"))
      .agg(min(col("keeper_p")).as("keeper"), sum(col("dups_p")).as("dups"))
  }

  /** Salted exact dedup: drop-in for Dedup.exact when the hash
    * distribution is known or suspected to be skewed.
    */
  def exactDedupSalted(df: DataFrame, textCol: String, idCol: String,
      saltFactor: Int = 64,
      hasher: Column => Column = Dedup.md5String): DataFrame =
    saltedDedupCounts(df, hasher(col(textCol)), col(idCol), saltFactor)
}
