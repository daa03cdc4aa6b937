package graft.streaming

import java.util.{Map => JMap, Set => JSet}

import graft.core.EventSchema
import graft.storage.Manifest
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.example.data.Group
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => V2Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
final case class SeqVectorOffset(seqs: Map[Int, Long]) extends V2Offset {
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

  def of(o: V2Offset): SeqVectorOffset = o match {
    case s: SeqVectorOffset => s
    // engine-side wrappers (e.g. restored checkpoint offsets)
    // round-trip through the canonical json
    case other => parse(other.json)
  }
}

/** DataSource v2 micro-batch source over a graft event store with
  * per-partition SEQUENCE offsets (SURVEY.md §3.3; the reference's
  * history→live seam, `subscription.rs:402-439`).
  *
  * Why not Spark's file source: that tracks processed FILES by path, so
  * compaction (all-new paths, same rows) redelivers history, and rate
  * limiting is files-per-trigger. Here:
  *
  *   - `latestOffset` offers only manifest-COMMITTED watermarks — an
  *     event above the watermark (data file written, commit pending) is
  *     never delivered, so a crash in that window cannot cause phantom
  *     delivery of rows that `recoverOrphans()` later deletes.
  *   - WINDOW rate limiting is the engine-standard admission-control
  *     contract: `maxEventsPerTrigger` becomes `ReadLimit.maxRows`,
  *     capping each micro-batch in EVENTS — the reference's WINDOW
  *     (max unacked in flight) exactly, including during catch-up.
  *   - offsets are sequence vectors: `compact()` between (or during)
  *     runs is invisible to checkpoints; a restarted query re-plans the
  *     same (start, end] range over whatever files now hold it.
  *   - the cursor is the engine's: `latestOffset(start, limit)`
  *     receives the last committed end offset, so there is no
  *     driver-side mutable cursor to re-initialize on restart (the
  *     fragile part of the v1 `Source` contract this replaces).
  *
  * Scale: `planInputPartitions` emits one task per (pid, file) under
  * the subscribed partition directories only — directory pruning comes
  * from the subscription matcher's pid set (`pids` option), not from
  * optimizer goodwill — and every reader pushes the (start, end]
  * sequence bounds into parquet row-group statistics, so catch-up over
  * a long-compacted log skips cold files on footer stats alone.
  * Readers run on executors, distributed like any batch scan; nothing
  * funnels through the driver.
  */
final class GraftEventMicroBatchStream(
    root: String,
    maxEventsPerTrigger: Option[Long],
    subscribedPids: Option[Set[Int]]) extends MicroBatchStream
    with SupportsAdmissionControl {

  // rotates the budget-allocation start partition so a hot low
  // partition cannot starve higher ones across triggers
  private var allocRotation: Int = 0

  private def watermarks(): Map[Int, Long] = {
    val wm = Manifest.load(root)
      .map(_.watermarks.filter(_._2 >= 0)).getOrElse(Map.empty)
    subscribedPids match {
      case Some(ps) => wm.filter { case (p, _) => ps.contains(p) }
      case None     => wm
    }
  }

  private def mergeMax(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    (a.keySet ++ b.keySet).iterator
      .map(k => k -> math.max(a.getOrElse(k, -1L), b.getOrElse(k, -1L))).toMap

  override def getDefaultReadLimit: ReadLimit =
    maxEventsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): V2Offset = SeqVectorOffset.empty

  override def deserializeOffset(json: String): V2Offset = SeqVectorOffset.parse(json)

  override def latestOffset(): V2Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = synchronized {
    val cursor = SeqVectorOffset.of(start).seqs
    val wm = watermarks()
    if (wm.isEmpty) return start
    val budget = limit match {
      case r: ReadMaxRows      => Some(r.maxRows())
      case _: ReadAllAvailable => None
      case _                   => None
    }
    val target = budget match {
      case None => mergeMax(cursor, wm)
      case Some(b) =>
        var rem = b
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
    if (offered.isEmpty) start else SeqVectorOffset(offered)
  }

  override def reportLatestOffset(): V2Offset = SeqVectorOffset(watermarks())

  override def planInputPartitions(start: V2Offset, end: V2Offset): Array[InputPartition] = {
    val s = SeqVectorOffset.of(start).seqs
    val e = SeqVectorOffset.of(end).seqs
    val conf = new Configuration()
    e.toSeq.sortBy(_._1).flatMap { case (pid, hi) =>
      val lo = s.getOrElse(pid, -1L)
      if (hi <= lo) Nil
      else listParquet(conf, s"$root/events/partition_id=$pid")
        .map(f => GraftFilePartition(pid, lo, hi, f))
    }.toArray
  }

  private def listParquet(conf: Configuration, dir: String): Seq[String] = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
      })
      .map(_.getPath.toString)
  }

  override def createReaderFactory(): PartitionReaderFactory = new GraftReaderFactory

  override def commit(end: V2Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftEventMicroBatchStream[$root]"
}

/** One file of one store partition, bounded to the batch's (lo, hi]
  * sequence range.
  */
final case class GraftFilePartition(pid: Int, lo: Long, hi: Long, file: String)
  extends InputPartition

final class GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftFilePartition])
}

/** Reads one event-log parquet file through parquet-hadoop's Group API
  * with the (lo, hi] sequence bounds compiled into a parquet filter
  * predicate — row-group statistics pruning happens inside the reader,
  * so a file wholly outside the range costs one footer read. The
  * directory-derived `partition_id` is re-attached here (Hive-style
  * layout keeps it out of the files).
  */
final class GraftPartitionReader(p: GraftFilePartition)
  extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] = {
    val seqCol = FilterApi.longColumn("partition_sequence")
    val pred = FilterApi.and(
      FilterApi.gt(seqCol, java.lang.Long.valueOf(p.lo)),
      FilterApi.ltEq(seqCol, java.lang.Long.valueOf(p.hi)))
    ParquetReader.builder(new GroupReadSupport(), new HPath(p.file))
      .withConf(new Configuration())
      .withFilter(FilterCompat.get(pred))
      .build()
  }

  private val toUnsafe = UnsafeProjection.create(EventSchema.schema)
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    def str(name: String): UTF8String =
      UTF8String.fromBytes(g.getBinary(name, 0).getBytes)
    def binOrNull(name: String): Array[Byte] =
      if (g.getFieldRepetitionCount(name) == 0) null
      else g.getBinary(name, 0).getBytes
    // EventSchema order: event_id, transaction_id, partition_key,
    // partition_id, partition_sequence, stream_version, stream_id,
    // event_name, timestamp_ns, metadata, payload
    toUnsafe(new GenericInternalRow(Array[Any](
      str("event_id"),
      str("transaction_id"),
      str("partition_key"),
      p.pid,
      g.getLong("partition_sequence", 0),
      g.getLong("stream_version", 0),
      str("stream_id"),
      str("event_name"),
      g.getLong("timestamp_ns", 0),
      binOrNull("metadata"),
      binOrNull("payload"))))
  }

  override def close(): Unit = reader.close()
}

/** `spark.readStream.format(classOf[GraftEventSourceProvider].getName)
  * .option("root", storeRoot).option("maxEventsPerTrigger", n)
  * .option("pids", "3,17").load()` — `pids` (optional) restricts the
  * source to the subscription matcher's partitions, which prunes both
  * the offset vector and the planned file set.
  */
class GraftEventSourceProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-events"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventSchema.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftEventTable

  /** Offsets/partitions come from the manifest, not file listings. */
  override def supportsExternalMetadata(): Boolean = false
}

final class GraftEventTable extends Table with SupportsRead {

  override def name(): String = "graft-events"

  override def schema(): StructType = EventSchema.schema

  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftEventScan(options)
    }
}

final class GraftEventScan(options: CaseInsensitiveStringMap) extends Scan {

  private val root = Option(options.get("root")).getOrElse(
    throw new IllegalArgumentException("graft-events source requires option 'root'"))

  override def readSchema(): StructType = EventSchema.schema

  override def description(): String = s"graft-events[$root]"

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftEventMicroBatchStream(
      root,
      Option(options.get("maxEventsPerTrigger")).map(_.toLong).filter(_ > 0),
      Option(options.get("pids")).map(_.split(",").map(_.trim.toInt).toSet))
}
