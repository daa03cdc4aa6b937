package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the simhash pairs pipeline (dev tool,
  * not part of the driver contract).
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val sh = graft.ops.Dedup.wordShingles(docs, "text", "doc_id", 3)
    t("shingles_distinct")(noop(sh))
    t("shingles_distinct2")(noop(sh))
    val hash = concat(md5(col("sh").cast("binary")),
      md5(concat(lit("1:"), col("sh")).cast("binary")))
    t("plus_hash")(noop(sh.select(col("id"), hash.as("th"))))
    val chunked = sh.select(col("id") +: (0 until 8).map(c =>
      conv(substring(hash, c * 8 + 1, 8), 16, 10).cast("long").as(s"c$c")): _*)
    t("plus_chunks")(noop(chunked))
    t("full_fingerprint")(noop(
      graft.ops.Dedup.simhash(docs, "text", "doc_id", 64, 3)))
    t("full_fingerprint2")(noop(
      graft.ops.Dedup.simhash(docs, "text", "doc_id", 64, 3)))
    val fp = graft.ops.Dedup.simhash(docs, "text", "doc_id", 64, 3).localCheckpoint()
    t("band_candidates") {
      println("cand=" + graft.ops.Dedup.simhashBandCandidates(fp, 64, 8).count())
    }
    t("full_pairs_64")(noop(
      graft.ops.Dedup.simhashPairs(docs, "text", "doc_id", 64, 8, 7, 3)))
    spark.stop()
  }
}
