package graft.tools

import org.apache.spark.sql.SparkSession

/** Idle settlement probe for the server-throughput family
  * (`server_appends_per_sec` / `server_delivered_per_sec`): min-of-3
  * (best-of, like every other ProbeLeg) runs of the SHARED
  * [[ServerSustained]] workload, with the load average witnessed per
  * round — the bench's reading swung 368.6 → 255.6 appends/s between
  * r13 (load 7.7) and r14 (load 16) and was unattributable because
  * this family alone had no idle probe. Run on an idle machine; the
  * MAX of the three is the settled throughput (throughput is a
  * higher-is-better metric — the best round is the machine's
  * capability, the others are contention).
  */
object ProbeServer {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bestApp = -1.0
    var bestDel = -1.0
    for (round <- 1 to 3) {
      val r = ServerSustained.run(spark)
      bestApp = math.max(bestApp, r.appendsPerSec)
      bestDel = math.max(bestDel, r.deliveredPerSec)
      println(f"round $round: appends/s ${r.appendsPerSec}%.1f | " +
        f"delivered/s ${r.deliveredPerSec}%.1f | " +
        f"write ${r.writeSec}%.2f s (${r.deliveredDuringWrite} del) | " +
        f"drain ${r.drainSec}%.2f s " +
        f"(${r.deliveredTotal - r.deliveredDuringWrite} del) | " +
        f"leg ${r.sec}%.2f s | " +
        f"load ${java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage}%.1f")
    }
    println(f"settled (best-of-3): appends/s $bestApp%.1f | " +
      f"delivered/s $bestDel%.1f")
    spark.stop()
  }
}
