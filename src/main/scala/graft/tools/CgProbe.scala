package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal reproduction probe: does a chain of StringReplace
  * expressions survive whole-stage/UnsafeProjection codegen, or fall
  * back to interpreter mode ("Redefinition of local variable")?
  */
object CgProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq((1L, "hello world")).toDF("id", "text")
    val out = df.select(replace(replace(col("text"), lit("l"), lit("L")),
      lit("o"), lit("0")).as("t"))
    out.collect().foreach(println)
    val enc = graft.ops.BpeTrain.bpeEncode(df, "text", "id",
      Seq(("h", "e"), ("l", "l")), samplePred = lit(true))
    enc.collect().foreach(println)
    spark.stop()
  }
}
