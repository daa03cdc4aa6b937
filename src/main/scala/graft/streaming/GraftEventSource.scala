package graft.streaming

import graft.core.EventSchema
import graft.storage.Manifest
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Offset of a graft event-log stream: the highest delivered
  * `partition_sequence` per partition id — the same per-partition
  * cursor vector the reference keeps per subscription
  * (`crates/sierradb-cluster/src/subscription.rs:441-461`). Offsets are
  * SEQUENCES, not file paths, so subscription checkpoints survive
  * `compact()` (which rewrites files but never renumbers sequences).
  *
  * JSON is canonical (pids ascending) because Structured Streaming
  * compares offsets by their JSON.
  */
final case class SeqVectorOffset(seqs: Map[Int, Long]) extends V1Offset {
  override val json: String =
    seqs.toSeq.sorted.map { case (p, s) => s""""$p":$s""" }.mkString("{", ",", "}")
}

object SeqVectorOffset {
  val empty: SeqVectorOffset = SeqVectorOffset(Map.empty)

  /** Parse exactly what `json` emits: `{"pid":seq,...}`. */
  def parse(json: String): SeqVectorOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) empty
    else SeqVectorOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  }

  def of(o: ConnectorOffset): SeqVectorOffset = o match {
    case s: SeqVectorOffset => s
    // SerializedOffset (and any other engine-side wrapper) round-trips
    // through its canonical json
    case other => parse(other.json)
  }
}

/** Structured Streaming source over a graft event store with
  * per-partition SEQUENCE offsets (SURVEY.md §3.3; the reference's
  * history→live seam, `subscription.rs:402-439`).
  *
  * Why not Spark's file source: that tracks processed FILES by path, so
  * compaction (all-new paths, same rows) redelivers history, and rate
  * limiting is files-per-trigger. Here:
  *
  *   - `getOffset` offers only manifest-COMMITTED watermarks — an event
  *     above the watermark (data file written, commit pending) is never
  *     delivered, so a crash in that window cannot cause phantom
  *     delivery of rows that `recoverOrphans()` later deletes.
  *   - `maxEventsPerTrigger` caps each micro-batch in EVENTS — the
  *     reference's WINDOW (max unacked in flight) exactly, including
  *     during history catch-up.
  *   - offsets are sequence vectors: `compact()` between (or during)
  *     runs is invisible to checkpoints; a restarted query re-plans the
  *     same (start, end] range over whatever files now hold it.
  *
  * Scale: `getBatch` returns a plain pruned parquet scan — partition
  * directory pruning from any `partition_id` conjunct the subscription
  * matcher adds, row-group pruning from the global sequence bounds —
  * executed distributed like any batch read; nothing funnels through
  * the driver.
  *
  * Restart contract: the engine replays the restored offset range
  * through `getBatch` before calling `getOffset` again (the documented
  * v1 Source recovery order), which re-initializes `cursor`; rate
  * limiting therefore never re-offers sequences below a committed
  * checkpoint.
  */
final class GraftEventSource(
    spark: SparkSession,
    root: String,
    maxEventsPerTrigger: Option[Long]) extends Source {

  // highest sequence already offered to (or restored by) the engine
  private var cursor: Map[Int, Long] = Map.empty

  // resolved base relation cached per manifest version: the directory
  // listing + schema resolution happen once per COMMIT, not once per
  // micro-batch (a throttled catch-up runs many batches over the same
  // file set)
  private var relCache: Option[(Long, DataFrame)] = None

  override def schema: StructType = EventSchema.schema

  private def mergeMax(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    (a.keySet ++ b.keySet).iterator
      .map(k => k -> math.max(a.getOrElse(k, -1L), b.getOrElse(k, -1L))).toMap

  // rotates the budget-allocation start partition so a hot low
  // partition cannot starve higher ones across triggers
  private var allocRotation: Int = 0

  override def getOffset: Option[V1Offset] = synchronized {
    val wm = Manifest.load(root).map(_.watermarks.filter(_._2 >= 0)).getOrElse(Map.empty)
    if (wm.isEmpty) return None
    val target = maxEventsPerTrigger match {
      case None => mergeMax(cursor, wm)
      case Some(budget) =>
        var rem = budget
        // fair allocation: start at a different partition each trigger
        // (a partition ingesting >= budget/trigger would otherwise
        // consume the whole budget forever in ascending-pid order)
        val pids = wm.keys.toSeq.sorted
        allocRotation = if (pids.isEmpty) 0 else (allocRotation + 1) % pids.length
        val rotated = pids.drop(allocRotation) ++ pids.take(allocRotation)
        val adv = rotated.map { pid =>
          val w = wm(pid)
          val lo = cursor.getOrElse(pid, -1L)
          val take = math.max(0L, math.min(w - lo, rem))
          rem -= take
          pid -> (lo + take)
        }.toMap
        mergeMax(cursor, adv)
    }
    val offered = target.filter(_._2 >= 0)
    if (offered.isEmpty) None
    else {
      cursor = offered
      Some(SeqVectorOffset(offered))
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = SeqVectorOffset.of(end).seqs
    val startV = start.map(o => SeqVectorOffset.of(o).seqs).getOrElse(Map.empty)
    synchronized { cursor = mergeMax(cursor, mergeMax(startV, endV)) }
    // the resolved file relation appends the directory-partition column
    // (partition_id) last; project back to the declared schema order —
    // the engine maps the streaming relation's attributes to this
    // plan's output POSITIONALLY
    val df = synchronized {
      val v = Manifest.load(root).map(_.version).getOrElse(-1L)
      relCache match {
        case Some((cv, cached)) if cv == v => cached
        case _ =>
          val fresh = ColumnBridge.streamingFileRelation(
              spark, s"$root/events", EventSchema.schema,
              Map("basePath" -> s"$root/events"))
            .select(EventSchema.columnNames.map(col): _*)
          relCache = Some((v, fresh))
          fresh
      }
    }
    if (endV.isEmpty) return df.where(lit(false))
    // (start, end] per partition: exact per-pid CASE bounds, plus simple
    // global bounds parquet pushes into row-group stats pruning
    val endExpr = endV.foldLeft(when(lit(false), lit(-1L))) {
      case (acc, (pid, s)) => acc.when(col("partition_id") === pid, lit(s))
    }.otherwise(lit(-1L))
    val startExpr = endV.keys.foldLeft(when(lit(false), lit(-1L))) {
      case (acc, pid) =>
        acc.when(col("partition_id") === pid, lit(startV.getOrElse(pid, -1L)))
    }.otherwise(lit(Long.MaxValue))
    val globalHi = endV.values.max
    val globalLo = endV.keys.map(p => startV.getOrElse(p, -1L)).min
    df.where(
      col("partition_sequence") <= globalHi &&
        col("partition_sequence") > globalLo &&
        col("partition_sequence") <= endExpr &&
        col("partition_sequence") > startExpr)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftEventSource[$root]"
}

/** `spark.readStream.format("graft.streaming.GraftEventSourceProvider")
  * .option("root", storeRoot).option("maxEventsPerTrigger", n).load()`
  */
class GraftEventSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-events"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), EventSchema.schema)

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException("graft-events source requires option 'root'"))
    new GraftEventSource(sqlContext.sparkSession, root,
      parameters.get("maxEventsPerTrigger").map(_.toLong).filter(_ > 0))
  }
}
