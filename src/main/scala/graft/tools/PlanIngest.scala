package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump the formatted physical plan of the bulk-ingest
  * assignment pipeline (EventStore.ingest's windows + routed write
  * input) — the evidence for the r18 ingest exchange-count audit,
  * which tools/Plans cannot show because ingest is an imperative store
  * operation, not a gated query. Builds a store and ingests a tiny
  * probe batch with plan capture enabled, printing the plan of the
  * LAST write executed (the ingest write itself).
  */
object PlanIngest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    // capture every executed plan; print the ingest write's one
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          plans.add(funcName + "\n" + qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    import scala.jdk.CollectionConverters._
    def ingestPlans: Seq[String] = plans.asScala.toSeq.filter(p =>
      p.contains("Window") && p.contains("InsertIntoHadoopFsRelation"))
    if (args.headOption.contains("layered")) {
      // ADVICE-r18 #5: the PARQUET-HEADS join path — heads spilled to
      // a parquet layer on every commit (maxInlineHeads = 0), so the
      // SECOND ingest's head join runs distributed instead of
      // broadcast. Its plan is the one under audit: count the
      // Exchanges the event payload flows through.
      import spark.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("plan-ingest-layered-").toString
      val es = graft.api.EventStore.open(spark, root,
        numPartitions = 8, maxInlineHeads = 0)
      def batch(tag: String) = (0 until 64)
        .map(i => (s"pl-$tag-${i % 16}", "E", i.toLong))
        .toDF("stream_id", "event_name", "arrival")
      es.ingest(batch("a"), "arrival") // spills heads to parquet
      plans.clear()
      es.ingest(batch("b"), "arrival") // joins the parquet head layer
      Thread.sleep(1500)
      println("===== ingest plan, PARQUET-HEADS join path " +
        "(maxInlineHeads=0, second commit) =====")
      ingestPlans.lastOption.foreach(println)
      graft.core.Fs.deleteRecursively(new java.io.File(root))
    } else {
      graft.StoreProvider.storeFor(spark, sf)
      // the listener bus is async — give it a beat to drain
      Thread.sleep(1500)
      // the ingest write is the first executed command that scans the
      // events source AND ends in a parquet insert with Window operators
      ingestPlans.headOption.orElse(plans.asScala.lastOption)
        .foreach(println)
    }
    spark.stop()
  }
}
