package graft.api

import java.util.UUID

import graft.core._
import graft.storage.{Manifest, ManifestState, StreamHead}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scan result: up to `count` events plus a has-more flag
  * (`escan.rs:150-162`: fetch count+1, return count).
  */
final case class ScanResult(events: DataFrame, hasMore: Boolean)

/** Spark-native event store with SierraDB's command semantics
  * (SURVEY.md §2.1): optimistic-concurrency appends, point lookups,
  * version/sequence range scans, head queries, subscriptions.
  *
  * Storage: a partitioned parquet event-log table
  * `<root>/events/partition_id=NN/part-....parquet`, each file sorted by
  * `partition_sequence` (so parquet row-group min/max stats play the
  * role of the reference's per-segment MPHF indexes — SURVEY §4), plus
  * a commit manifest whose per-partition watermark bounds reader
  * visibility (snapshot isolation; `docs/Watermarks.md` semantics).
  *
  * Scale notes (100 TB): all reads are single-partition-pruned filters
  * or partition-parallel scans; bulk ingest assigns gapless sequences
  * with one shuffle (window over partition_id) — the per-partition
  * serialization the reference enforces with one writer thread per
  * bucket (`writer_thread_pool.rs:292-407`) is here enforced by the
  * shuffle placing each partition_id in exactly one task.
  */
final class EventStore private (
    val spark: SparkSession,
    val root: String,
    val numPartitions: Int,
    @volatile private var state: ManifestState,
    strictVersioning: Boolean,
    maxInlineHeads: Int) {

  import spark.implicits._

  private val eventsDir = s"$root/events"
  private val lock = new Object

  def manifest: ManifestState = state

  // ---------------------------------------------------------------- writes

  /** EAPPEND (`eappend.rs:179-255`): single-event optimistic append. */
  def append(input: EventInput, partitionKey: Option[UUID] = None): Either[String, AppendResult] =
    mappend(
      partitionKey.getOrElse(Ids.partitionKeyForStream(input.streamId)),
      Seq(input)).map(_.events.head)

  /** EMAPPEND (`emappend.rs`, `writer_thread_pool.rs:795-850`): atomic
    * multi-event, multi-stream append within ONE partition. All-or-
    * nothing; later events in the batch validate against versions
    * produced by earlier events in the same batch (intra-batch
    * increments), not just stored state.
    */
  def mappend(partitionKey: UUID, inputs: Seq[EventInput]): Either[String, MultiAppendResult] = {
    if (inputs.isEmpty) return Left("ERR no events")
    for (in <- inputs) {
      StreamId.validate(in.streamId) match {
        case Left(e) => return Left(s"ERR $e")
        case _       =>
      }
      if (strictVersioning && !in.expectedVersion.isStrictAllowed)
        return Left("ERR strict versioning requires empty or exact expected version")
    }
    val pHash = Ids.partitionHash(partitionKey)
    val pid = Ids.partitionIdFor(pHash, numPartitions)
    for (in <- inputs; eid <- in.eventId)
      if (!Ids.validateEventId(eid, pHash))
        return Left("ERR event id does not carry the transaction's partition hash")

    lock.synchronized {
      // validate all expected versions against stored + intra-batch
      // state; version counters are scoped per (partition_key, stream)
      // like the reference's per-partition stream indexes
      val batchHeads = collection.mutable.Map.empty[String, Long]
      for (in <- inputs) {
        val current = batchHeads.get(in.streamId)
          .map(CurrentVersion.Current(_): CurrentVersion)
          .getOrElse(currentVersionOf(in.streamId, partitionKey))
        in.expectedVersion.gapFrom(current) match {
          case VersionGap.None => batchHeads(in.streamId) = current.next
          case gap => return Left(s"ERR version conflict on '${in.streamId}': $gap")
        }
      }

      val txId = Ids.withSingleEventFlag(
        UUID.randomUUID(), flag = inputs.lengthCompare(1) == 0)
      val startSeq = state.watermark(pid) + 1
      val nowMs = System.currentTimeMillis()

      val versionCursor = collection.mutable.Map.empty[String, Long]
      val rows = inputs.zipWithIndex.map { case (in, i) =>
        val tsMs = in.timestampMs.getOrElse(nowMs)
        val version = versionCursor.get(in.streamId)
          .map(_ + 1)
          .getOrElse(currentVersionOf(in.streamId, partitionKey).next)
        versionCursor(in.streamId) = version
        Event(
          event_id = in.eventId.getOrElse(Ids.newEventId(pHash)).toString,
          transaction_id = txId.toString,
          partition_key = partitionKey.toString,
          partition_id = pid,
          partition_sequence = startSeq + i,
          stream_version = version,
          stream_id = in.streamId,
          event_name = in.eventName,
          timestamp_ns = math.multiplyExact(tsMs, 1000000L),
          metadata = in.metadata,
          payload = in.payload)
      }

      writeRows(rows)

      val newHeads = rows.groupBy(_.stream_id).map { case (sid, evs) =>
        EventStore.headKey(partitionKey.toString, sid) ->
          StreamHead(evs.map(_.stream_version).max, partitionKey.toString, pid)
      }
      commitAppend(
        Map(pid -> (startSeq + rows.size - 1)), newHeads.toMap)

      Right(MultiAppendResult(
        partitionKey.toString, pid, startSeq, startSeq + rows.size - 1,
        rows.map(r => AppendResult(
          r.event_id, r.partition_key, r.partition_id,
          r.partition_sequence, r.stream_version, r.timestamp_ns / 1000000L))))
    }
  }

  /** Group-commit append (the reference syncs batched writes on
    * bytes/events/interval thresholds — `writer_thread_pool.rs:684-696`;
    * here the caller batches). Each input routes by its own stream id;
    * validation failures are reported per event while accepted events
    * commit atomically in ONE parquet write + ONE manifest commit.
    * Versions validate against stored state plus earlier accepted
    * events in the batch, like EMAPPEND's intra-batch rule.
    */
  def appendMany(inputs: Seq[EventInput]): Seq[Either[String, AppendResult]] =
    lock.synchronized {
      val nowMs = System.currentTimeMillis()
      val seqCursor = collection.mutable.Map.empty[Int, Long]
      val verCursor = collection.mutable.Map.empty[String, Long]
      val rows = collection.mutable.ArrayBuffer.empty[Event]
      val results = inputs.map { in =>
        StreamId.validate(in.streamId) match {
          case Left(e) => Left(s"ERR $e")
          case Right(_) if strictVersioning && !in.expectedVersion.isStrictAllowed =>
            Left("ERR strict versioning requires empty or exact expected version")
          case Right(_) =>
            val pk = Ids.partitionKeyForStream(in.streamId)
            val pHash = Ids.partitionHash(pk)
            val pid = Ids.partitionIdFor(pHash, numPartitions)
            if (in.eventId.exists(id => !Ids.validateEventId(id, pHash)))
              Left("ERR event id does not carry the stream's partition hash")
            else {
              val current = verCursor.get(in.streamId)
                .map(CurrentVersion.Current(_): CurrentVersion)
                .getOrElse(currentVersionOf(in.streamId, pk))
              in.expectedVersion.gapFrom(current) match {
                case VersionGap.None =>
                  val seq = seqCursor.getOrElse(pid, state.watermark(pid)) + 1
                  seqCursor(pid) = seq
                  val version = current.next
                  verCursor(in.streamId) = version
                  val tsMs = in.timestampMs.getOrElse(nowMs)
                  val ev = Event(
                    event_id = in.eventId.getOrElse(Ids.newEventId(pHash)).toString,
                    transaction_id = Ids.withSingleEventFlag(
                      UUID.randomUUID(), flag = true).toString,
                    partition_key = pk.toString,
                    partition_id = pid,
                    partition_sequence = seq,
                    stream_version = version,
                    stream_id = in.streamId,
                    event_name = in.eventName,
                    timestamp_ns = math.multiplyExact(tsMs, 1000000L),
                    metadata = in.metadata,
                    payload = in.payload)
                  rows += ev
                  Right(AppendResult(ev.event_id, ev.partition_key, pid,
                    seq, version, tsMs))
                case gap => Left(s"ERR version conflict on '${in.streamId}': $gap")
              }
            }
        }
      }
      if (rows.nonEmpty) {
        writeRows(rows.toSeq)
        val newHeads = rows.groupBy(_.stream_id).map { case (sid, evs) =>
          EventStore.headKey(evs.head.partition_key, sid) ->
            StreamHead(evs.map(_.stream_version).max,
              evs.head.partition_key, evs.head.partition_id)
        }
        commitAppend(seqCursor.toMap, newHeads.toMap)
      }
      results
    }

  /** Compaction — the segment-rollover analogue
    * (`writer_thread_pool.rs:698-793`): rewrite each partition
    * directory into one sequence-sorted file so point lookups and range
    * scans touch few, stat-tight row groups after many small group
    * commits. Single-writer engine: done under the write lock with a
    * directory swap. (A multi-writer deployment would track files in
    * the manifest and swap there instead.)
    *
    * Subscription checkpoints SURVIVE compaction: the streaming source
    * tracks per-partition sequences, not file paths
    * ([[graft.streaming.GraftEventSource]]), and compaction rewrites
    * files without renumbering sequences. A subscription resumed from a
    * pre-compaction checkpoint re-plans its next (start, end] range
    * over the rewritten files — no duplicates, no gaps. (A query whose
    * in-flight batch races the directory swap fails that batch and
    * redelivers it on restart — fail-safe, never silent loss.)
    */
  def compact(): Unit = lock.synchronized {
    if (state.watermarks.isEmpty) return
    val compacted = spark.read
      .schema(EventSchema.schema)
      .option("basePath", eventsDir)
      .parquet(eventsDir)
      .repartition(col("partition_id"))
      .sortWithinPartitions(col("partition_sequence"))
    val tmp = s"$root/events.compact.tmp"
    compacted.write
      .mode("overwrite")
      .partitionBy("partition_id")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#event_id", "true")
      .option("parquet.bloom.filter.enabled#stream_id", "true")
      .parquet(tmp)
    val ev = java.nio.file.Paths.get(eventsDir)
    val old = java.nio.file.Paths.get(s"$root/events.pre-compact")
    java.nio.file.Files.move(ev, old)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), ev)
    deleteRecursively(old.toFile)
    commitState(state.copy(version = state.version + 1))
    // compaction also folds the head LSM into a fresh base table
    foldHeads()
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.core.Fs.deleteRecursively(f)

  /** Bulk ingest — the 100 TB path. Routes rows to partitions by
    * stream-id hash, assigns gapless partition sequences and stream
    * versions with window functions (ONE shuffle on partition_id; the
    * stream_version window reuses it where stream→partition routing
    * allows, otherwise adds a shuffle on stream_id), and appends to the
    * log with a single manifest commit.
    *
    * @param df       columns: stream_id, event_name, payload, metadata,
    *                 timestamp_ms (missing optional columns defaulted)
    * @param orderCol arrival-order column defining intra-batch order
    *                 (must be unique per stream for deterministic seqs)
    * @param batchTag streaming-ingest identity (checkpoint, batchId):
    *                 recorded in the SAME manifest commit as the
    *                 watermarks/heads so idempotence-marker and data
    *                 visibility can never diverge across a crash
    */
  def ingest(
      df: DataFrame,
      orderCol: String,
      batchTag: Option[(String, Long)] = None): Long = lock.synchronized {
    val np = numPartitions
    // one SHA-1 per row, not three: derive (partition_key, hash, id)
    // together
    val routeOfStream = udf { sid: String =>
      val pk = Ids.partitionKeyForStream(sid)
      val h = Ids.partitionHash(pk)
      (pk.toString, h, Ids.partitionIdFor(h, np))
    }
    val newId = udf((pHash: Int, tsMs: Long, r1: Int, r2: Long) =>
      Ids.uuidV7WithPartitionHash(pHash, tsMs, r1 & 0xfff, r2 & ((1L << 46) - 1)).toString)

    val base = df
      .withColumn("timestamp_ms",
        if (df.columns.contains("timestamp_ms")) col("timestamp_ms")
        else lit(System.currentTimeMillis()))
      .withColumn("metadata",
        if (df.columns.contains("metadata")) col("metadata") else lit(Array.emptyByteArray))
      .withColumn("payload",
        if (df.columns.contains("payload")) col("payload") else lit(Array.emptyByteArray))
      .withColumn("route", routeOfStream($"stream_id"))
      .withColumn("partition_key", $"route._1")
      .withColumn("p_hash", $"route._2")
      .withColumn("partition_id", $"route._3")
      .drop("route")

    val wmMap = state.watermarks
    // head state is keyed by (partition_key, stream); ingest derives
    // default keys, so join the bases on both columns — PLUS the
    // derived partition_id (r19): a stream lives in exactly one
    // partition, so adding partition_id to the join keys changes no
    // matches, but it lets a DISTRIBUTED head join (heads spilled to
    // parquet and too big to broadcast) satisfy its clustering from
    // the hash(partition_id) exchange established below — the event
    // payload crosses ONE exchange on every head path, instead of a
    // join-key re-shuffle sneaking a second payload pass back in at
    // exactly the scale where heads stop broadcasting (guide §3.3).
    // While the head side fits the broadcast threshold (the common
    // case, and everything the bench exercises) AQE still plans a
    // broadcast join and the shape is unchanged.
    val wmDf = broadcast(wmMap.toSeq.toDF("partition_id", "wm_base"))
    val pidOfKey = udf((pk: String) =>
      Ids.partitionIdFor(Ids.partitionHash(java.util.UUID.fromString(pk)), np))
    val headsView = headsDf().select(
      $"stream_id", $"partition_key", $"version".as("head_base"))
      .withColumn("partition_id", pidOfKey($"partition_key"))
    val headDf =
      if (!hasParquetHeadLayers(state)) broadcast(headsView) else headsView

    val wp = Window.partitionBy($"partition_id").orderBy(col(orderCol))
    // stream-version window: partitioned by (partition_id, stream_id),
    // NOT bare stream_id. Semantically identical (every stream routes
    // to exactly one partition_id, so each window partition holds the
    // same rows either way), but the widened spec is satisfied by the
    // hash(partition_id) distribution the sequence window just
    // established — ClusteredDistribution(partition_id, stream_id) is
    // met by HashPartitioning(partition_id) — so this window plans as
    // a LOCAL re-sort, not a second full shuffle of the event payload.
    // Combined with the write below inheriting the same partitioning,
    // bulk ingest moves the payload through ONE exchange instead of
    // the pre-r18 three (stream window + sequence window + an explicit
    // repartition).
    val ws = Window.partitionBy($"partition_id", $"stream_id")
      .orderBy(col(orderCol))
    // bulk ingest is semantically MANY single-event transactions, so
    // each row gets its own transaction id with the single-event flag
    // SET (read_transaction's short-circuit depends on the flag being
    // deliberate, not an accident of random variant bits). Built from
    // rand() inputs, NOT UUID.randomUUID(): SecureRandom serializes on
    // a lock across all 32 tasks at millions of rows per batch.
    val newTxId = udf((r1: Long, r2: Long) =>
      Ids.withSingleEventFlag(new UUID(r1, r2), flag = true).toString)

    val assigned = base
      // THE one payload exchange, established before the joins: the
      // broadcast wm/head joins preserve it, both windows' clustering
      // is satisfied by it (subset rule), and the partitioned write
      // inherits it — and if the head side ever degrades to a
      // distributed join, its requirement (clustering on the join
      // keys, partition_id included) is ALSO satisfied by it, so the
      // payload still moves exactly once.
      .repartition($"partition_id")
      .join(wmDf, Seq("partition_id"), "left")
      .join(headDf, Seq("partition_id", "stream_id", "partition_key"),
        "left")
      .withColumn("partition_sequence",
        row_number().over(wp).cast("long") + coalesce($"wm_base", lit(-1L)))
      .withColumn("stream_version",
        row_number().over(ws).cast("long") + coalesce($"head_base", lit(-1L)))
      .withColumn("event_id", newId(
        $"p_hash", $"timestamp_ms",
        (rand() * 4096).cast("int"), (rand() * 7.0368744177664e13).cast("long")))
      .withColumn("transaction_id", newTxId(
        (rand() * Long.MaxValue).cast("long"), (rand() * Long.MaxValue).cast("long")))
      .withColumn("timestamp_ns", $"timestamp_ms" * lit(1000000L))
      .select(EventSchema.columnNames.map(col): _*)

    val preFiles = listDataFiles()
    assigned
      // each partition_id already lives in exactly one task: both
      // windows above run under the ONE hash(partition_id) exchange
      // (see `ws`), and nothing after them re-partitions — so the
      // partitioned write emits one file per partition per commit (the
      // reference's segment shape) with no extra repartition. The sort
      // leads with partition_id so the writer's required ordering
      // (partition columns first) is satisfied and rows land
      // sequence-sorted within each file without a writer-side re-sort.
      .sortWithinPartitions($"partition_id", $"partition_sequence")
      .write
      .mode("append")
      .partitionBy("partition_id")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#event_id", "true")
      .option("parquet.bloom.filter.enabled#stream_id", "true")
      .parquet(eventsDir)

    // head/watermark roll-up: ONE columnar scan over just the files
    // this commit wrote (4 columns, stats-friendly) — cheaper than
    // caching and re-walking the whole assignment plan
    val newFiles = (listDataFiles() -- preFiles).toSeq
    val rollup = spark.read
      .schema(EventSchema.schema)
      .option("basePath", eventsDir)
      .parquet(newFiles: _*)
      .groupBy($"stream_id", $"partition_key", $"partition_id")
      .agg(max($"stream_version").as("version"), max($"partition_sequence").as("ps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wmStats = rollup.groupBy($"partition_id")
      .agg(max($"ps").as("wm"), count(lit(1)).as("nheads"))
      .collect()
    val newWm = wmStats.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = newWm.map { case (k, nw) => nw - wmMap.getOrElse(k, -1L) }.sum
    val headCount = wmStats.map(_.getLong(2)).sum
    val withTag = (st: ManifestState) => st.copy(
      streamBatchIds = batchTag.fold(st.streamBatchIds) { case (ck, id) =>
        st.streamBatchIds.updated(ck, id)
      })

    if (state.streamHeads.size + headCount <= maxInlineHeads) {
      // small batch: heads stay in the inline overlay (no extra layer)
      val newHeads = rollup.collect().map(r =>
        EventStore.headKey(r.getString(1), r.getString(0)) ->
          StreamHead(r.getLong(3), r.getString(1), r.getInt(2))).toMap
      rollup.unpersist()
      commitState(withTag(state.copy(
        version = state.version + 1,
        watermarks = wmMap ++ newWm,
        streamHeads = state.streamHeads ++ newHeads)))
    } else {
      // big batch (the 100 TB path): spill batch heads ∪ inline overlay
      // to ONE parquet delta, straight from the executors — the driver
      // never holds the head set
      val v = state.version + 1
      val batchDf = rollup
        .select($"stream_id", $"partition_key", $"partition_id", $"version")
      val deltaDf =
        if (state.streamHeads.isEmpty) batchDf
        else resolveLayers(Seq(inlineHeadsDfOf(state) -> 0L, batchDf -> 1L))
      writeHeadsParquet(deltaDf, headsDeltaDir(v),
        approxRows = state.streamHeads.size + headCount)
      rollup.unpersist()
      commitState(withTag(state.copy(
        version = v,
        watermarks = wmMap ++ newWm,
        streamHeads = Map.empty,
        headsDeltas = state.headsDeltas :+ v)))
      invalidateHeadCache() // after the commit (see commitAppend)
      maybeFoldHeads()
    }
    n
  }

  /** Crash recovery (the parquet analogue of the reference's segment
    * reconciliation on open, `database.rs:463-700`): a crash between a
    * data-file write and its manifest commit leaves orphan files whose
    * sequences sit above the committed watermark. They are invisible to
    * watermark-clamped reads, but a LATER commit would advance the
    * watermark over them and surface duplicates — so delete them before
    * accepting any new writes. Runs once per open.
    */
  private[api] def recoverOrphans(): Unit = lock.synchronized {
    val files = listDataFiles()
    if (files.isEmpty) return
    val wmMap = state.watermarks
    val perFile = spark.read
      .schema(EventSchema.schema)
      .option("basePath", eventsDir)
      .parquet(eventsDir)
      .groupBy(input_file_name().as("f"), col("partition_id"))
      .agg(min(col("partition_sequence")).as("lo"))
      .collect()
    perFile.foreach { r =>
      if (r.getAs[Long]("lo") > wmMap.getOrElse(r.getAs[Int]("partition_id"), -1L)) {
        val p = java.nio.file.Paths.get(java.net.URI.create(r.getAs[String]("f")))
        java.nio.file.Files.deleteIfExists(p)
      }
    }
  }

  // ------------------------------------------------------- head-state (LSM)

  /** The reference keeps per-partition live stream indexes in memory
    * (`writer_thread_pool.rs:188-267`); at billions of streams that is
    * a driver OOM, so heads are LSM-layered (see ManifestState): a
    * bounded inline overlay in the manifest JSON, spilled to versioned
    * parquet deltas under `<root>/_heads/`, folded into a base table.
    * Newer layer wins per (partition_key, stream_id).
    */
  private val headsSchema = EventStore.headsParquetSchema

  private def headsBaseDir(v: Long) = s"$root/_heads/base-v$v"
  private def headsDeltaDir(v: Long) = s"$root/_heads/delta-v$v"

  /** point-lookup cache over the parquet layers (positive + negative);
    * invalidated whenever the layer structure changes (spill/fold).
    * Invalidation is a GENERATION bump, not just clear(): a lookup that
    * started against the old layers must not insert its result after
    * the structure changed, or the stale entry would survive until the
    * next spill (and append validation would read it).
    */
  /** built once — newHadoopConf() copies the entire SQL conf and costs
    * ~10 ms, which would dominate a jobless point lookup
    */
  private lazy val probeHadoopConf = spark.sessionState.newHadoopConf()

  private val headCache =
    new java.util.LinkedHashMap[String, Option[StreamHead]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[StreamHead]]): Boolean =
        size() > 8192
    }
  // per-STREAM layered heads (all partition keys of one stream id) —
  // the optimizer's head-lookup rewrite hits this instead of running a
  // Spark aggregate inside the rule; same generation discipline
  private val streamHeadsCache =
    new java.util.LinkedHashMap[String, Seq[StreamHead]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[StreamHead]]): Boolean =
        size() > 4096
    }
  private val headCacheGen = new java.util.concurrent.atomic.AtomicLong(0)

  private def invalidateHeadCache(): Unit = headCache.synchronized {
    headCacheGen.incrementAndGet()
    headCache.clear()
    streamHeadsCache.clear()
    // the process-wide probe caches (listings/footers/blooms) hold
    // entries for this store's layer files — drop them too, or folded-
    // away layers leak for the JVM's life and a deleted-and-recreated
    // store path would be served stale metadata
    graft.storage.HeadProbe.invalidate(s"$root/_heads")
  }

  private def readHeads(dir: String): DataFrame =
    spark.read.schema(headsSchema).parquet(dir)

  private def inlineHeadsDfOf(snap: ManifestState): DataFrame =
    snap.streamHeads.toSeq.map { case (k, h) =>
      (EventStore.headKeyStream(k), h.partitionKey, h.partitionId, h.version)
    }.toDF("stream_id", "partition_key", "partition_id", "version")

  /** parquet layers oldest-first as (df, priority); inline excluded.
    * Always derive from ONE captured snapshot: re-reading live state
    * mid-operation races a concurrent fold (layers can vanish between
    * an emptiness check and the union).
    */
  private def parquetHeadLayers(snap: ManifestState): Seq[(DataFrame, Long)] = {
    val base =
      if (snap.headsBase > 0) Seq(readHeads(headsBaseDir(snap.headsBase)) -> 0L)
      else Nil
    base ++ snap.headsDeltas.map(v => readHeads(headsDeltaDir(v)) -> v)
  }

  private def hasParquetHeadLayers(snap: ManifestState): Boolean =
    snap.headsBase > 0 || snap.headsDeltas.nonEmpty

  /** latest-wins merge of head layers (higher priority wins per key) */
  private def resolveLayers(layers: Seq[(DataFrame, Long)]): DataFrame =
    if (layers.sizeIs == 1) layers.head._1
    else layers.map { case (df, pri) => df.withColumn("pri", lit(pri)) }
      .reduce(_ unionByName _)
      .groupBy($"stream_id", $"partition_key")
      .agg(max_by(struct($"partition_id", $"version"), $"pri").as("h"))
      .select($"stream_id", $"partition_key",
        $"h.partition_id".as("partition_id"), $"h.version".as("version"))

  /** All current stream heads as a DataFrame — the scalable view
    * (columns: stream_id, partition_key, partition_id, version).
    */
  def headsDf(): DataFrame = {
    val snap = state
    val parquet = parquetHeadLayers(snap)
    val layers = parquet ++
      (if (snap.streamHeads.nonEmpty || parquet.isEmpty)
        Seq(inlineHeadsDfOf(snap) -> Long.MaxValue)
      else Nil)
    resolveLayers(layers)
  }

  private def lookupHead(pk: String, sid: String): Option[StreamHead] = {
    val snap = state
    val key = EventStore.headKey(pk, sid)
    snap.streamHeads.get(key) match {
      case some @ Some(_) => some
      case None =>
        if (!hasParquetHeadLayers(snap)) None
        else {
          val (cached, gen0) = headCache.synchronized(
            (Option(headCache.get(key)), headCacheGen.get()))
          cached.getOrElse {
            // JOBLESS serving path: probe layers newest-first with a
            // driver-side footer-pruned parquet read (row-group stats +
            // bloom filter, see HeadProbe) — a point lookup must not
            // pay a Spark job launch (~90 ms) per probe. Newest-first
            // + stop-at-first-hit equals the layered max-priority
            // merge, because keys are unique within a layer.
            val layersNewestFirst =
              snap.headsDeltas.sorted.reverse.map(headsDeltaDir) ++
                (if (snap.headsBase > 0) Seq(headsBaseDir(snap.headsBase))
                 else Nil)
            val hit = layersNewestFirst.iterator
              .map(dir =>
                graft.storage.HeadProbe.probe(dir, sid, pk, probeHadoopConf))
              .collectFirst { case Some((pid, ver)) =>
                StreamHead(ver, pk, pid)
              }
            headCache.synchronized {
              // drop the result if a spill/fold happened mid-lookup
              if (headCacheGen.get() == gen0) headCache.put(key, hit)
            }
            hit
          }
        }
    }
  }

  /** Every head entry of one stream id across all partition keys, from
    * the given snapshot: inline overlay (newest, wins per key) merged
    * with the parquet layers. The layered part is cached per stream id
    * under the same generation discipline as [[lookupHead]] — layers
    * only change on spill/fold, which bumps the generation — so a hot
    * caller (the ESVER head-lookup rewrite) runs the layer aggregate at
    * most once per (stream, layer-generation).
    */
  private[api] def lookupStreamHeads(
      snap: ManifestState, sid: String): Seq[StreamHead] = {
    val inline = snap.streamHeads.collect {
      case (k, h) if EventStore.isCompositeHeadKey(k) &&
        EventStore.headKeyStream(k) == sid => h
    }.toSeq
    val layered =
      if (!hasParquetHeadLayers(snap)) Nil
      else {
        val (cached, gen0) = headCache.synchronized(
          (Option(streamHeadsCache.get(sid)), headCacheGen.get()))
        cached.getOrElse {
          // JOBLESS, like lookupHead: per-layer driver-side probes,
          // newest layer wins per partition key
          val layersNewestFirst =
            snap.headsDeltas.sorted.reverse.map(headsDeltaDir) ++
              (if (snap.headsBase > 0) Seq(headsBaseDir(snap.headsBase))
               else Nil)
          val merged =
            collection.mutable.LinkedHashMap.empty[String, StreamHead]
          layersNewestFirst.foreach { dir =>
            graft.storage.HeadProbe.probeStream(dir, sid, probeHadoopConf)
              .foreach { case (pk, pid, ver) =>
                if (!merged.contains(pk)) merged(pk) = StreamHead(ver, pk, pid)
              }
          }
          val hit = merged.values.toSeq
          headCache.synchronized {
            // drop the result if a spill/fold happened mid-lookup
            if (headCacheGen.get() == gen0) streamHeadsCache.put(sid, hit)
          }
          hit
        }
      }
    val inlineKeys = inline.map(_.partitionKey).toSet
    inline ++ layered.filterNot(h => inlineKeys.contains(h.partitionKey))
  }

  /** Commit an append's watermark/head updates; spill the inline
    * overlay to a parquet delta when it outgrows maxInlineHeads.
    */
  private def commitAppend(
      newWm: Map[Int, Long], newHeads: Map[String, StreamHead]): Unit = {
    val inline = state.streamHeads ++ newHeads
    if (inline.size <= maxInlineHeads) {
      commitState(state.copy(
        version = state.version + 1,
        watermarks = state.watermarks ++ newWm,
        streamHeads = inline))
    } else {
      val v = state.version + 1
      writeHeadsParquet(
        inline.toSeq.map { case (k, h) =>
          (EventStore.headKeyStream(k), h.partitionKey, h.partitionId, h.version)
        }.toDF("stream_id", "partition_key", "partition_id", "version"),
        headsDeltaDir(v), approxRows = inline.size)
      commitState(state.copy(
        version = v,
        watermarks = state.watermarks ++ newWm,
        streamHeads = Map.empty,
        headsDeltas = state.headsDeltas :+ v))
      // invalidate AFTER the commit: a lookup racing the window between
      // bump and commit would otherwise cache an old-layer result under
      // the new generation
      invalidateHeadCache()
      maybeFoldHeads()
    }
  }

  private val MaxHeadDeltas = 8

  private def maybeFoldHeads(): Unit =
    if (state.headsDeltas.sizeIs > MaxHeadDeltas) foldHeads()

  /** Fold base + deltas + inline into one layer (the LSM compaction).
    * If the merged head set fits the inline budget it folds back INTO
    * the manifest — a small store keeps O(1) map lookups instead of
    * being permanently demoted to parquet reads. Old layer directories
    * become unreferenced and are removed on next open.
    */
  private[api] def foldHeads(): Unit = lock.synchronized {
    if (!hasParquetHeadLayers(state)) return // inline-only: nothing to fold
    val layers = parquetHeadLayers(state) ++
      (if (state.streamHeads.nonEmpty)
        Seq(inlineHeadsDfOf(state) -> Long.MaxValue)
      else Nil)
    val resolved = resolveLayers(layers)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val v = state.version + 1
      val total = resolved.count()
      if (total <= maxInlineHeads) {
        val inline = resolved.collect().map(r =>
          EventStore.headKey(r.getString(1), r.getString(0)) ->
            StreamHead(r.getLong(3), r.getString(1), r.getInt(2))).toMap
        commitState(state.copy(
          version = v, streamHeads = inline, headsBase = 0L, headsDeltas = Nil))
        invalidateHeadCache() // after the commit (see commitAppend)
      } else {
        writeHeadsParquet(resolved, headsBaseDir(v), approxRows = total)
        commitState(state.copy(
          version = v, streamHeads = Map.empty, headsBase = v, headsDeltas = Nil))
        invalidateHeadCache() // after the commit (see commitAppend)
      }
    } finally resolved.unpersist()
  }

  /** Range-sorted, bloom-filtered layout: a (stream_id, partition_key)
    * point lookup prunes to one file / few row groups by min-max stats.
    * File count scales with the layer's ROW count (~500k entries per
    * file), not the session's shuffle parallelism — a 64-entry delta in
    * 32 shard files would cost a point probe 32 footer reads for
    * nothing, while a folded billion-head base still shards wide.
    */
  private def writeHeadsParquet(df: DataFrame, dir: String,
      approxRows: Long): Unit = {
    val shards = math.max(1L, math.min(2048L,
      (approxRows + 499999L) / 500000L)).toInt
    df.select($"stream_id", $"partition_key", $"partition_id", $"version")
      .repartitionByRange(shards, $"stream_id", $"partition_key")
      .sortWithinPartitions($"stream_id", $"partition_key")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#stream_id", "true")
      .parquet(dir)
  }

  /** Delete head-layer directories no manifest references (crash
    * between a layer write and its manifest commit, or layers folded
    * away). Runs once per open.
    */
  private[api] def recoverOrphanHeads(): Unit = lock.synchronized {
    val dir = java.nio.file.Paths.get(root, "_heads")
    if (!java.nio.file.Files.isDirectory(dir)) return
    val keep = (if (state.headsBase > 0) Set(s"base-v${state.headsBase}") else Set.empty) ++
      state.headsDeltas.map(v => s"delta-v$v")
    val listing = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .filterNot(p => keep.contains(p.getFileName.toString))
        .foreach(p => deleteRecursively(p.toFile))
    } finally listing.close()
  }

  private def listDataFiles(): Set[String] = {
    val dir = java.nio.file.Paths.get(eventsDir)
    if (!java.nio.file.Files.isDirectory(dir)) Set.empty
    else {
      val s = java.nio.file.Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toSet
      } finally s.close()
    }
  }

  /** Streaming ingest: continuous EAPPEND through Structured Streaming.
    * Each micro-batch rides the bulk `ingest` path (exactly-once per
    * batch via the sink checkpoint: a batch that fails before the
    * manifest commit replays; sequences stay gapless because
    * assignment is deterministic given the pre-batch manifest).
    */
  def ingestStream(
      stream: DataFrame,
      orderCol: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotence across replays: a crash after the manifest commit
        // but before the sink checkpoint commit replays this batchId —
        // the manifest remembers the last applied id per checkpoint.
        // The marker is written by ingest() in the SAME commit as the
        // watermarks: a crash can never leave the data committed but
        // the marker missing (which would re-ingest on replay).
        lock.synchronized {
          if (state.streamBatchIds.getOrElse(checkpoint, -1L) < batchId &&
              !batch.isEmpty) {
            ingest(batch, orderCol, Some(checkpoint -> batchId))
          }
        }
        ()
      }
      .start()

  // ----------------------------------------------------------------- reads

  /** Watermark-clamped snapshot of the event log (every read goes
    * through this — the visibility rule of `read.rs:460-489`).
    */
  def events(): DataFrame = {
    val snap = state
    if (snap.watermarks.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], EventSchema.schema)
    val df = spark.read
      .schema(EventSchema.schema)
      .option("basePath", eventsDir)
      .parquet(eventsDir)
    df.where(wmClamp(snap))
  }

  private def wmClamp(snap: ManifestState): Column = {
    // Two conjuncts: (a) a simple global bound that parquet can push
    // into row-group stats pruning on every scan shape, and (b) the
    // exact per-partition clamp — a CASE chain while small (folded to
    // a constant whenever the scan is pruned to one partition, e.g.
    // EGET/ESCAN), one map literal at high partition counts so the
    // plan stays O(1) nodes (`functions.keyedLookup`).
    val wms = snap.watermarks
    if (wms.isEmpty) lit(false)
    else {
      val globalMax = wms.values.max
      val wmExpr =
        graft.functions.functions.keyedLookup(wms, col("partition_id"), -1L)
      col("partition_sequence") <= globalMax && col("partition_sequence") <= wmExpr
    }
  }

  /** EGET (`eget.rs:26-65`): point lookup routed by the partition hash
    * embedded in the event UUID — prunes to ONE directory partition,
    * then parquet bloom filter + row-group stats prune files.
    */
  def get(eventId: UUID): DataFrame = {
    val pid = Ids.partitionIdForEventId(eventId, numPartitions)
    events()
      .where(col("partition_id") === pid && col("event_id") === eventId.toString)
      .limit(1)
  }

  /** read_transaction (`database.rs:138-208`): all committed events of
    * the transaction containing `eventId`, from that event's offset
    * forward — passing the transaction's FIRST event id (the reference
    * caller's contract) returns the whole transaction. The stored
    * transaction id's single-event flag (`Ids.withSingleEventFlag`,
    * `id.rs` bit layout) short-circuits the second lookup for the
    * overwhelmingly common single-event case.
    */
  def readTransaction(eventId: UUID): DataFrame = {
    val pid = Ids.partitionIdForEventId(eventId, numPartitions)
    val hit = events()
      .where(col("partition_id") === pid && col("event_id") === eventId.toString)
      .select(col("transaction_id"), col("partition_sequence"))
      .limit(1).collect()
    hit.headOption match {
      case None => events().limit(0)
      case Some(r) =>
        val tx = r.getString(0)
        if (Ids.singleEventFlag(UUID.fromString(tx))) get(eventId)
        else events()
          .where(col("partition_id") === pid && col("transaction_id") === tx &&
            col("partition_sequence") >= r.getLong(1))
          .orderBy(col("partition_sequence"))
    }
  }

  /** ESCAN (`escan.rs`): stream scan by version range, ascending,
    * `count` events max, has_more flag. Default count 100
    * (`escan.rs:138`); start/end inclusive.
    */
  def scan(
      streamId: String,
      startVersion: Option[Long] = None,
      endVersion: Option[Long] = None,
      count: Int = 100,
      partitionKey: Option[UUID] = None): ScanResult = {
    val pk = partitionKey.getOrElse(Ids.partitionKeyForStream(streamId))
    val pid = Ids.partitionIdFor(Ids.partitionHash(pk), numPartitions)
    // partition_key conjunct: versions are scoped per (pk, stream), so
    // a colliding key's same-named stream in this partition must not
    // interleave (its versions also start at 0)
    var q = events()
      .where(col("partition_id") === pid && col("stream_id") === streamId &&
        col("partition_key") === pk.toString)
    startVersion.foreach(v => q = q.where(col("stream_version") >= v))
    endVersion.foreach(v => q = q.where(col("stream_version") <= v))
    val rows = q.orderBy(col("stream_version")).limit(count + 1)
    page(rows, count)
  }

  /** EPSCAN (`epscan.rs`, `read.rs:451-563`): partition scan by
    * sequence range; end clamped to the watermark.
    */
  def pscan(
      partitionId: Int,
      startSeq: Option[Long] = None,
      endSeq: Option[Long] = None,
      count: Int = 100): ScanResult = {
    var q = events().where(col("partition_id") === partitionId)
    startSeq.foreach(v => q = q.where(col("partition_sequence") >= v))
    endSeq.foreach(v => q = q.where(col("partition_sequence") <= v))
    val rows = q.orderBy(col("partition_sequence")).limit(count + 1)
    page(rows, count)
  }

  private def page(rows: DataFrame, count: Int): ScanResult = {
    val collected = rows.collect()
    val hasMore = collected.length > count
    val kept = collected.take(count)
    ScanResult(
      spark.createDataFrame(
        spark.sparkContext.parallelize(kept.toIndexedSeq, 1), rows.schema),
      hasMore)
  }

  // ------------------------------------------------------------ read cache

  /** Point-lookup result cache — the command-serving role of the
    * reference's segment block cache, with the same observable counter
    * surface (`info.rs:30-113`). Committed events are immutable, so
    * entries never need invalidation; the cache is byte-bounded LRU.
    */
  private val egetCacheMaxBytes = 64L * 1024 * 1024
  private val egetCache = new java.util.LinkedHashMap[String, Row](64, 0.75f, true)
  private var egetCacheBytes = 0L
  private val cacheHits = new java.util.concurrent.atomic.AtomicLong
  private val cacheMisses = new java.util.concurrent.atomic.AtomicLong
  private val cacheEvictions = new java.util.concurrent.atomic.AtomicLong

  private def rowBytes(r: Row): Long = {
    def len(a: Any): Long = a match {
      case b: Array[Byte] => b.length.toLong
      case s: String      => 40L + s.length.toLong * 2 // on-heap chars
      case _              => 8L
    }
    64L + r.toSeq.map(len).sum
  }

  /** EGET through the read cache (hit = no scan at all). */
  def getCached(eventId: UUID): Option[Row] = {
    val key = eventId.toString
    egetCache.synchronized(Option(egetCache.get(key))) match {
      case some @ Some(_) =>
        cacheHits.incrementAndGet()
        some
      case None =>
        cacheMisses.incrementAndGet()
        val row = get(eventId).collect().headOption
        row.foreach { r =>
          egetCache.synchronized {
            // re-check under the lock: a concurrent miss on the same id
            // may have filled it — counting its bytes twice would
            // permanently inflate the budget
            if (!egetCache.containsKey(key)) {
              egetCacheBytes += rowBytes(r)
              egetCache.put(key, r)
              val it = egetCache.entrySet().iterator()
              while (egetCacheBytes > egetCacheMaxBytes && it.hasNext) {
                val e = it.next(); it.remove()
                egetCacheBytes -= rowBytes(e.getValue)
                cacheEvictions.incrementAndGet()
              }
            }
          }
        }
        row
    }
  }

  /** INFO CACHE counters with the reference's exact key set and
    * hit_ratio rounding (`info.rs:30-113`). block_size_bytes reports
    * the parquet row-group target — our IO unit, the role BLOCK_SIZE
    * plays there.
    */
  def cacheInfo: Map[String, Any] = {
    val h = cacheHits.get(); val m = cacheMisses.get()
    val ratio =
      if (h + m > 0) math.round(h.toDouble / (h + m) * 1000.0) / 1000.0 else 0.0
    egetCache.synchronized(Map(
      "hits" -> h,
      "misses" -> m,
      "hit_ratio" -> ratio,
      "entries" -> egetCache.size().toLong,
      "memory_bytes" -> egetCacheBytes,
      "max_bytes" -> egetCacheMaxBytes,
      "block_size_bytes" -> 134217728L,
      "evictions" -> cacheEvictions.get()))
  }

  /** ESVER: current max stream version within the stream's partition
    * (`ESVER sid [PARTITION_KEY u]` — versions are scoped per
    * (partition_key, stream) exactly like the reference's per-partition
    * stream indexes, `database.rs:298-357`). None if absent. O(1) from
    * the manifest heads.
    */
  def sver(streamId: String, partitionKey: Option[UUID] = None): Option[Long] = {
    val pk = partitionKey.getOrElse(Ids.partitionKeyForStream(streamId))
    lookupHead(pk.toString, streamId).map(_.version)
  }

  /** EPSEQ: current max partition sequence, None if the partition is
    * empty. O(1) from the watermark vector.
    */
  def pseq(partitionId: Int): Option[Long] = {
    val wm = state.watermark(partitionId)
    if (wm < 0) None else Some(wm)
  }

  private def currentVersionOf(streamId: String, pk: UUID): CurrentVersion =
    CurrentVersion.fromOption(sver(streamId, Some(pk)))

  /** All stream heads as (stream_id, partition_key, version),
    * MATERIALIZED to the driver — test/diagnostic convenience; use
    * `headsDf()` at scale.
    */
  def streamHeadEntries: Seq[(String, String, Long)] =
    if (!hasParquetHeadLayers(state))
      state.streamHeads.toSeq.map { case (k, h) =>
        (EventStore.headKeyStream(k), h.partitionKey, h.version)
      }
    else headsDf().collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(3)))

  /** Number of live (partition_key, stream) head entries. */
  def streamCount: Long =
    if (!hasParquetHeadLayers(state)) state.streamHeads.size.toLong
    else headsDf().count()

  /** HELLO / INFO surface (`hello.rs:20-57`). */
  def info: Map[String, String] = Map(
    "server" -> "sierraspark",
    "version" -> "0.1.0",
    "num_partitions" -> numPartitions.toString,
    "manifest_version" -> state.version.toString)

  // ------------------------------------------------------------- internals

  private def writeRows(rows: Seq[Event]): Unit = {
    spark.createDataset(rows.toList)
      .toDF()
      .coalesce(1)
      .sortWithinPartitions($"partition_sequence")
      .write
      .mode("append")
      .partitionBy("partition_id")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#event_id", "true")
      .parquet(eventsDir)
  }

  private def commitState(next: ManifestState): Unit = {
    Manifest.commit(root, next)
    state = next
  }
}

object EventStore {
  val DefaultNumPartitions = 32 // `config.rs:200`

  /** Open an existing store or create an empty one at `root`.
    *
    * @param maxInlineHeads max (partition_key, stream) head entries the
    *                       manifest keeps inline before spilling to the
    *                       parquet head-state table — the bound on
    *                       driver-resident head memory
    */
  def open(
      spark: SparkSession,
      root: String,
      numPartitions: Int = DefaultNumPartitions,
      strictVersioning: Boolean = false,
      maxInlineHeads: Int = 100000): EventStore = {
    val st0 = Manifest.load(root).getOrElse(Manifest.empty(numPartitions))
    // migrate legacy manifests whose heads were keyed by bare stream id
    // (the StreamHead value always carried the partition key)
    val st =
      if (st0.streamHeads.keys.forall(isCompositeHeadKey)) st0
      else st0.copy(streamHeads = st0.streamHeads.map { case (k, h) =>
        (if (isCompositeHeadKey(k)) k else headKey(h.partitionKey, k)) -> h
      })
    val es = new EventStore(
      spark, root, st.numPartitions.max(1), st, strictVersioning, maxInlineHeads)
    // a fresh handle must not trust process-wide probe caches for this
    // path: the same root may have been deleted and recreated since a
    // previous store cached its layer metadata
    graft.storage.HeadProbe.invalidate(s"$root/_heads")
    es.recoverOrphans()
    es.recoverOrphanHeads()
    register(es)
    es
  }

  // ---- store registry (optimizer rules resolve relations to stores) ----

  /** What a rule may know about a store: its root and geometry. Plain
    * strings/ints — registering never retains the EventStore instance
    * (a closed or superseded handle's in-memory state must not answer
    * queries; the committed truth is always re-read from disk).
    */
  final case class RegisteredStore(root: String, numPartitions: Int)

  /** Registry value: the plain-strings descriptor plus a WEAK reference
    * to the live handle. The weak ref never keeps a handle alive, and a
    * handle's in-memory state is only ever trusted after a version
    * probe against disk (`headsForRewrite`) — a stale or superseded
    * handle fails the probe and the committed truth is re-read.
    */
  private val registry = new java.util.concurrent.ConcurrentHashMap[
    String, (RegisteredStore, java.lang.ref.WeakReference[EventStore])]()

  private def normalizePath(p: String): String =
    java.nio.file.Paths.get(p).normalize().toString

  private def register(es: EventStore): Unit =
    registry.put(normalizePath(s"${es.root}/events"),
      (RegisteredStore(es.root, es.numPartitions),
        new java.lang.ref.WeakReference(es)))

  /** The registered store whose events directory backs this file
    * relation, if any — how the optimizer rules prove a scan is a
    * graft event log (path identity, not column-name guessing).
    */
  def registeredFor(
      fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation)
      : Option[RegisteredStore] =
    fs.location.rootPaths.iterator
      .map(p => normalizePath(p.toUri.getPath))
      .flatMap(p => Option(registry.get(p)).map(_._1))
      .nextOption()

  /** Snapshot + per-stream heads for [[graft.plans.HeadLookupRewrite]],
    * cheapest sound path first:
    *
    *   1. if the registered LIVE handle's in-memory manifest version
    *      matches the newest on-disk version (a directory-listing
    *      probe — no file read, no JSON parse, no Spark job), answer
    *      from that handle's snapshot and its generation-cached
    *      per-stream head lookup. On the hot path (repeated head
    *      queries between commits) this is pure memory.
    *   2. otherwise (no live handle, or a concurrent writer advanced
    *      the manifest) fall back to the full disk snapshot read.
    */
  def headsForRewrite(
      spark: SparkSession,
      reg: RegisteredStore,
      streamId: String): Option[(ManifestState, Seq[StreamHead])] = {
    val live = Option(registry.get(normalizePath(s"${reg.root}/events")))
      .flatMap(e => Option(e._2.get()))
    live match {
      case Some(h) =>
        val snap = h.manifest
        if (snap.version > 0 &&
            Manifest.newestVersion(reg.root).contains(snap.version))
          Some((snap, h.lookupStreamHeads(snap, streamId)))
        else headsFromDisk(spark, reg, streamId)
      case None => headsFromDisk(spark, reg, streamId)
    }
  }

  /** Disk-snapshot view for [[graft.plans.HeadLookupRewrite]]: the
    * loaded manifest plus every head entry of one stream id ACROSS ALL
    * partition keys (a bare `stream_id = x` filter matches the stream
    * under every key, so the rewrite must consider each entry — and
    * check the clamp at each entry's partition). Layer files are
    * immutable, so snapshot + layers is a consistent point-in-time
    * view regardless of which live handle — if any — wrote it.
    */
  def headsFromDisk(
      spark: SparkSession,
      reg: RegisteredStore,
      streamId: String): Option[(ManifestState, Seq[StreamHead])] =
    Manifest.load(reg.root).map { snap =>
      val inline = snap.streamHeads.collect {
        case (k, h) if isCompositeHeadKey(k) && headKeyStream(k) == streamId => h
      }.toSeq
      val layered =
        if (snap.headsBase == 0 && snap.headsDeltas.isEmpty) Nil
        else {
          import org.apache.spark.sql.functions.{col, lit, max_by, struct}
          val layers =
            (if (snap.headsBase > 0)
              Seq(s"${reg.root}/_heads/base-v${snap.headsBase}" -> 0L)
            else Nil) ++
              snap.headsDeltas.map(v => s"${reg.root}/_heads/delta-v$v" -> v)
          layers.map { case (dir, pri) =>
            spark.read.schema(headsParquetSchema).parquet(dir)
              .withColumn("pri", lit(pri))
          }.reduce(_ unionByName _)
            .where(col("stream_id") === streamId)
            .groupBy(col("partition_key"))
            .agg(max_by(struct(col("version"), col("partition_id")), col("pri")).as("h"))
            .collect()
            .map(r => StreamHead(
              r.getStruct(1).getLong(0), r.getString(0), r.getStruct(1).getInt(1)))
            .toSeq
        }
      // the inline overlay is the newest layer: it wins per key
      val inlineKeys = inline.map(_.partitionKey).toSet
      (snap, inline ++ layered.filterNot(h => inlineKeys.contains(h.partitionKey)))
    }

  private[api] val headsParquetSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("stream_id",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("partition_key",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("partition_id",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("version",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** heads map key: 36-char uuid prefix + ':' + stream id (fixed-width
    * prefix, safe for any stream id content).
    */
  private[api] def headKey(pk: String, sid: String): String = pk + ":" + sid

  private[api] def headKeyStream(key: String): String = key.substring(37)

  private val UuidRe = "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}".r

  private[api] def isCompositeHeadKey(k: String): Boolean =
    k.length > 37 && k.charAt(36) == ':' && UuidRe.matches(k.substring(0, 36))
}
