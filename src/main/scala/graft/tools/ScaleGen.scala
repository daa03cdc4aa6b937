package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale replica of a testdata directory, for the scale-proof
  * bench leg: every SF-scaled table is unioned 10 times with re-keyed
  * ids; the fixed-size dimensions (region, nation — constant at any
  * TPC-H SF) are copied as-is.
  *
  * Re-keying adds `replica × 10^12` to every key column of a scaled
  * table — the SAME offset for every key domain, so foreign keys stay
  * consistent across tables (orders replica i references customer
  * replica i). Non-key payloads (text, embeddings, prices) replicate
  * verbatim: each document/vector gains 9 exact duplicates, which is a
  * realistic dedup workload and keeps every per-row cost identical to
  * the base corpus. Read the dedup legs' 10× ratios with that in mind:
  * candidate-pair VERIFICATION work grows with the duplicate factor
  * (every doc now collides with its 9 replicas), so ratios above 10
  * there reflect the duplicated workload, not operator
  * super-linearity — the banding/bucketing stages themselves stay
  * linear in corpus size.
  *
  * The replica is generated ONCE into a content-addressed cache dir
  * (keyed by source dir name) with a completion marker; a crashed
  * generation is re-done from scratch.
  */
object ScaleGen {

  val Factor = 10
  val KeyOffset = 1000000000000L // > any base key in any domain

  /** scaled tables → their key columns (offset per replica) */
  val ScaledKeys: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  val FixedTables: Seq[String] = Seq("region", "nation")

  /** cache key includes a fingerprint of the source listing (names +
    * lengths), so a regenerated source dir gets a fresh replica
    * instead of silently benching stale data
    */
  private def srcFingerprint(srcDir: String): String = {
    val files = Option(new java.io.File(srcDir).listFiles()).getOrElse(Array())
      .flatMap { f =>
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array())
            .map(g => s"${f.getName}/${g.getName}:${g.length()}")
        else Array(s"${f.getName}:${f.length()}")
      }.sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(files.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Generate (or reuse) the 10× replica of `srcDir`; returns its path.
    *
    * The session must have `spark.sql.legacy.parquet.nanosAsLong=true`
    * (events.parquet carries TIMESTAMP(NANOS); the scan throws without
    * it — Bench's session sets it). A generation that dies mid-way
    * leaves no `_COMPLETE` marker and is re-done from scratch.
    */
  def ensure10x(spark: SparkSession, srcDir: String): String = {
    require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .contains("true"),
      "ScaleGen needs spark.sql.legacy.parquet.nanosAsLong=true " +
        "(events.parquet is TIMESTAMP(NANOS))")
    val prefix = s"graft-scale${Factor}x-${new java.io.File(srcDir).getName}"
    val dst = s"/tmp/$prefix-${srcFingerprint(srcDir)}"
    val marker = java.nio.file.Paths.get(dst, "_COMPLETE")
    if (java.nio.file.Files.exists(marker)) return dst
    // a changed source means the old replica will never be read again —
    // drop stale siblings (same source, other fingerprints) so /tmp
    // holds at most one replica per source across rounds
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array())
      .filter(f => (f.getName == prefix || // pre-fingerprint layout
        f.getName.startsWith(prefix + "-")) && f.toString != dst)
      .foreach(delete)
    val dstDir = new java.io.File(dst)
    if (dstDir.exists()) delete(dstDir)
    FixedTables.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.option("compression", "zstd").parquet(s"$dst/$t.parquet")
    }
    ScaledKeys.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$srcDir/$t.parquet")
      replicate(base, keys)
        .write.option("compression", "zstd").parquet(s"$dst/$t.parquet")
    }
    java.nio.file.Files.createFile(marker)
    dst
  }

  def replicate(base: DataFrame, keys: Seq[String]): DataFrame =
    (0 until Factor).map { i =>
      keys.foldLeft(base)((df, k) =>
        df.withColumn(k, (col(k) + lit(i.toLong * KeyOffset)).cast("long")))
    }.reduce(_ unionByName _)

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
