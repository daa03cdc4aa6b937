package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase breakdown of the stream_dedup_simhash_pruned leg:
  * doc-store build (session-cached), index seed, and the stream drain
  * with per-batch walls — the measurement behind any claim about
  * where the pruned streaming-dedup floor actually lives.
  * Usage: runMain graft.tools.ProbeStreamDedupPhases [rounds]
  */
object ProbeStreamDedupPhases {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // per-job wall clock, tagged by the thread-local description set
    // around each in-batch step — attributes the batch wall to steps
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(j.jobId,
            (Option(j.properties.getProperty("spark.job.description"))
              .getOrElse("?"), j.time))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(j.jobId)
          if (s != null) jobLog.add((s._1, j.time - s._2))
        }
      })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val isNew = graft.ops.Curation.hashBucket(col("doc_id"), "ingest") < lit(1000)
    for (round <- 1 to rounds) {
      var des: graft.api.EventStore = null
      val tStore = time { des = graft.StoreProvider.docStoreFor(spark, d, isNew) }
      val root = java.nio.file.Files.createTempDirectory("probe-pdx-")
      val tSeed = time {
        graft.streaming.GenIndex.init(root.toString) { dir =>
          graft.streaming.StreamingDedup.seedSimhashIndexPruned(
            graft.Tables.documents(spark, d).where(!isNew), "text",
            "doc_id", dir)
        }
      }
      val batchWalls = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val batchNo = new java.util.concurrent.atomic.AtomicInteger(0)
      val ck = java.nio.file.Files.createTempDirectory("probe-pdx-ck-")
      var nPairs = 0L
      val tDrain = time {
        val q = spark.readStream.schema(graft.core.EventSchema.schema)
          .option("basePath", s"${des.root}/events")
          .option("maxFilesPerTrigger", "11")
          .parquet(s"${des.root}/events")
          .writeStream
          .option("checkpointLocation", ck.toString)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val w = time {
              val pairs = graft.streaming.StreamingDedup
                .simhashProbeBatchPruned(
                  b.select(
                    expr("CAST(substring(stream_id, 5, 30) AS BIGINT)")
                      .as("doc_id"),
                    col("payload").cast("string").as("text")),
                  "text", "doc_id",
                  graft.streaming.GenIndex.currentGen(root.toString))
              if (batchNo.incrementAndGet() % 2 == 0)
                graft.streaming.GenIndex.compact(spark, root.toString,
                  Seq("pfx"), partitionCols = Seq("pfx"))
              nPairs += pairs.count()
            }
            batchWalls.add(w)
            ()
          }
          .start()
        try q.processAllAvailable()
        finally { q.stop(); graft.core.Fs.deleteRecursively(ck.toFile) }
      }
      graft.core.Fs.deleteRecursively(root.toFile)
      import scala.jdk.CollectionConverters._
      val bw = batchWalls.asScala.toSeq
      println(f"round $round: store $tStore%.2f | seed $tSeed%.2f | " +
        f"drain $tDrain%.2f (${bw.size} batches: " +
        bw.map(w => f"$w%.2f").mkString(" ") +
        f"; in-batch sum ${bw.sum}%.2f, scaffold ${tDrain - bw.sum}%.2f) " +
        f"| pairs $nPairs")
      val jl = jobLog.asScala.toSeq
      println(s"  jobs this round: ${jl.size}, wall sum " +
        f"${jl.map(_._2).sum / 1000.0}%.2f s; top: " +
        jl.sortBy(-_._2).take(12)
          .map { case (d, ms) => s"${d.take(40)}=$ms" }.mkString(" | "))
      jobLog.clear()
    }
    spark.stop()
  }
}
