package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: exercise ScaleGen.ensure10x (incl. stale-sibling cleanup). */
object ProbeGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dst = ScaleGen.ensure10x(spark, args.headOption.getOrElse("/root/testdata/sf0.001"))
    println(s"GEN dst=$dst")
    val n = spark.read.parquet(s"$dst/documents.parquet").count()
    println(s"GEN docs=$n")
    spark.stop()
  }
}
