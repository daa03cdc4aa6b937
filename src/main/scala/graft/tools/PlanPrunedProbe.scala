package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only plan evidence for the r19 readTouchedPruned change: the
  * per-batch PAIRS plan of the pruned streaming simhash probe, with
  * the index slice read (a) through a localCheckpoint (the pre-r19
  * shape — the index side appears as a Scan ExistingRDD materialized
  * by its own scheduled job) and (b) directly from the pruned parquet
  * directories (the r19 shape — the scan rides the pairs job, one
  * fewer job per micro-batch). Usage:
  *   runMain graft.tools.PlanPrunedProbe [before|after]
  */
object PlanPrunedProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = graft.Tables.documents(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("plan-pruned-").toString
    graft.streaming.StreamingDedup.seedSimhashIndexPruned(
      docs.where(col("doc_id") % 10 =!= 0), "text", "doc_id", dir)
    val fp = graft.ops.Dedup.simhash(
      docs.where(col("doc_id") % 10 === 0), "text", "doc_id", 64, 3)
    val probe = graft.ops.Dedup.simhashBandRows(fp, 64, 4)
      .withColumn("pfx",
        graft.streaming.StreamingDedup.bkeyPrefix(col("band"), col("bkey"), 64))
      .localCheckpoint()
    val touched = probe.select(col("pfx")).distinct()
      .collect().map(_.getLong(0)).toSet
    val live = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("pfx="))
      .map(_.getName.stripPrefix("pfx=").toLong).toSet
    val hit = (touched & live).toSeq.sorted
    val slice0 = spark.read.option("basePath", dir)
      .parquet(hit.map(p => s"$dir/pfx=$p"): _*).drop("pfx")
    val mode = args.headOption.getOrElse("after")
    val index = if (mode == "before") slice0.localCheckpoint() else slice0
    // the shared pairs core's shape (simhashPairsAgainst), restated:
    // probe ⋈ index ∪ probe ⋈ probe on (band, bkey), fingerprints
    // carried, hamming as a projection
    val px = probe.select(col("band"), col("bkey"), col("id").as("x"),
      col("simhash").as("sx"))
    def ySide(df: org.apache.spark.sql.DataFrame) =
      df.select(col("band"), col("bkey"), col("id").as("y"),
        col("simhash").as("sy"))
    val pairs = px.join(ySide(index), Seq("band", "bkey"))
      .unionByName(px.join(ySide(probe.drop("pfx")), Seq("band", "bkey")))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"),
        when(col("x") < col("y"), col("sx")).otherwise(col("sy")).as("sa"),
        when(col("x") < col("y"), col("sy")).otherwise(col("sx")).as("sb"))
      .distinct()
      .withColumn("hamming",
        graft.ops.Dedup.hammingDistance(col("sa"), col("sb"), 64)
          .cast("long"))
      .where(col("hamming") <= 3)
      .select(col("a"), col("b"), col("hamming"))
    println(s"===== pruned probe PAIRS plan, index slice " +
      s"${if (mode == "before") "localCheckpointed (pre-r19: its " +
        "materialization was a separate scheduled job per batch)"
      else "read directly (r19: the scan rides the pairs job)"} =====")
    println(pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    graft.core.Fs.deleteRecursively(new java.io.File(dir))
    spark.stop()
  }
}
