package graft.tools

import org.apache.spark.sql.SparkSession

/** State-store configuration sweep over the stateful streaming legs —
  * the measurement behind the round-19 "cut the streaming scaffold
  * constant" item. Each named gated query runs min-of-N under each
  * config (session confs are captured by a streaming query at start,
  * so flipping them between runs is enough — every leg starts a fresh
  * checkpoint). Usage:
  *   runMain graft.tools.ProbeStateStore [rounds] <query> [<query> ...]
  *
  * NOTE: since this probe's findings shipped, the gated scaffolds
  * apply SparkEntry.tuneStateStore themselves (RocksDB + changelog +
  * join format v3), overriding whatever this sweep sets — run with
  * SPARK_GRAFT_STATE_STORE=hdfs so the scaffold leaves the session
  * confs alone and the sweep's config column is what actually runs.
  */
object ProbeStateStore {
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** (label, confs to set). Confs not named by a config are restored
    * to their pre-sweep values before each run.
    */
  val Configs: Seq[(String, Map[String, String])] = Seq(
    "hdfs-default" -> Map.empty,
    "rocksdb-changelog" -> Map(
      "spark.sql.streaming.stateStore.providerClass" -> RocksDb,
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        -> "true"),
    "rocksdb-changelog-vcf" -> Map(
      "spark.sql.streaming.stateStore.providerClass" -> RocksDb,
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        -> "true",
      "spark.sql.streaming.join.stateFormatVersion" -> "3"),
    "hdfs-nosnapshot" -> Map(
      "spark.sql.streaming.stateStore.minDeltasForSnapshot" -> "100"),
    "rocksdb-vcf-nochangelog" -> Map(
      "spark.sql.streaming.stateStore.providerClass" -> RocksDb,
      "spark.sql.streaming.join.stateFormatVersion" -> "3")
  )

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: ProbeStateStore [rounds] <query> [<query> ...]")
    val (rounds, queries) =
      if (args.head.forall(_.isDigit)) (args.head.toInt, args.tail.toSeq)
      else (2, args.toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val touched = Configs.flatMap(_._2.keys).distinct
    val saved = touched.map(k => k -> spark.conf.getOption(k)).toMap
    queries.foreach { n =>
      Configs.foreach { case (label, confs) =>
        touched.foreach { k =>
          saved(k) match {
            case Some(v) => spark.conf.set(k, v)
            case None => spark.conf.unset(k)
          }
        }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        var best = Double.MaxValue
        for (round <- 1 to rounds) {
          val t = try time {
            graft.SparkEntry.queries(n)(spark, sf)
              .write.mode("overwrite").format("noop").save()
          } catch { case e: Throwable =>
            println(s"$n [$label] round $round FAILED: ${e.getMessage}")
            -1.0
          }
          if (t >= 0) best = math.min(best, t)
          println(f"$n [$label] round $round: $t%.2f s | load $load%.1f")
        }
        println(f"$n [$label] MIN: $best%.2f")
      }
    }
    spark.stop()
  }
}
