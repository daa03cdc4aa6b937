package graft.streaming

import graft.api.EventStore
import graft.core.Ids
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** ESUB/EPSUB/EACK semantics on Structured Streaming
  * (reference behavior: `crates/sierradb-cluster/src/subscription.rs`,
  * commands `esub.rs`/`epsub.rs`/`eack.rs`; SURVEY.md §2.1 #8-10, §3.3).
  *
  * The event log IS the stream, read through [[GraftEventSource]] —
  * a custom source whose offsets are per-partition SEQUENCE vectors
  * (the reference's per-subscription cursor), not file paths. That
  * gives the same catch-up→live seam the reference implements by
  * replaying segment history and then following the broadcast bus,
  * with exactly-once per-subscription delivery guaranteed by source
  * offsets + checkpoint instead of `has_seen` cursors — and it
  * survives `compact()`, which renames files but never sequences.
  *
  *   - FROM version/sequence → a `stream_version`/`partition_sequence`
  *     lower-bound filter (per stream/partition map supported);
  *   - WINDOW n (max unacked in flight) → `maxEventsPerTrigger = n` on
  *     the source: every micro-batch holds at most n EVENTS (real
  *     event-granular backpressure, catch-up included), with the
  *     sink's checkpoint commit playing the EACK role: an
  *     unacknowledged (failed) batch is redelivered after restart,
  *     acked batches never are.
  */
object Subscriptions {

  /** Which events a subscription matches (`esub.rs:65-200` shapes):
    * stream entries — bare (`streams`) or with an explicit partition
    * key (`streamKeys`, like `ESUB sid PARTITION_KEY u`; the same
    * stream may appear multiple times with different keys, matching the
    * reference's set-of-(stream, key) selector) — or one/many/all
    * partitions.
    */
  final case class Matcher(
      streams: Seq[String] = Nil,
      partitions: Seq[Int] = Nil,
      allPartitions: Boolean = false,
      streamKeys: Seq[(String, java.util.UUID)] = Nil) {
    /** every subscribed stream name */
    def streamNames: Seq[String] = (streams ++ streamKeys.map(_._1)).distinct
  }

  sealed trait From
  object From {
    /** Live only: start after the current head. */
    case object Latest extends From
    /** Catch up from this version/sequence (inclusive) for all matched
      * streams/partitions.
      */
    final case class Value(v: Long) extends From
    /** Per-stream (ESUB MAP) or per-partition (EPSUB MAP) starting
      * points, with an optional default for unlisted keys.
      */
    final case class PerKey(m: Map[String, Long], default: Option[Long] = None) extends From
  }

  /** Build the subscription as a streaming DataFrame. The caller picks
    * the sink (`deliver` below, or any writeStream); the checkpoint
    * location given at sink time is the subscription's identity (the
    * reference's subscription UUID + ack cursor in one).
    */
  def subscribe(
      es: EventStore,
      matcher: Matcher,
      from: From = From.Value(0),
      window: Int = 1000): DataFrame = {
    val spark = es.spark
    // the matcher's partition set, handed to the source so BOTH the
    // offset vector and the planned file set prune to subscribed
    // partitions (directory pruning by construction, not by optimizer)
    val matchedPids: Option[Seq[Int]] =
      if (matcher.allPartitions) None
      else if (matcher.streamNames.nonEmpty) {
        val entries = matcher.streams.map(s => Ids.partitionKeyForStream(s)) ++
          matcher.streamKeys.map(_._2)
        Some(entries.map(pk =>
          Ids.partitionIdFor(Ids.partitionHash(pk), es.numPartitions)).distinct)
      } else if (matcher.partitions.nonEmpty) Some(matcher.partitions.distinct)
      else None
    // WINDOW backpressure: a micro-batch stays "unacked" until its
    // checkpoint commit; the sequence-offset source bounds every batch
    // to `window` events exactly. The source also clamps delivery to
    // manifest-committed watermarks, so a crash between a data-file
    // write and its manifest commit can never phantom-deliver rows
    // that recoverOrphans() later deletes.
    val src = {
      val rs = spark.readStream
        .format(classOf[GraftEventSourceProvider].getName)
        .option("root", es.root)
        .option("maxEventsPerTrigger", window.toString)
      matchedPids.fold(rs)(ps => rs.option("pids", ps.mkString(","))).load()
    }

    val matched = {
      val streamFilter =
        if (matcher.streamNames.nonEmpty) {
          // exact reference semantics (`subscription.rs:163-199`): a
          // stream entry matches (stream_id, partition_key) precisely,
          // with bare entries resolving to the derived default key
          // (`esub.rs` parse). The partition_id conjunct is implied by
          // the key and lets the file source directory-prune (the EGET
          // routing trick) without changing which rows match.
          val entries: Seq[(String, java.util.UUID)] =
            matcher.streams.map(s => s -> Ids.partitionKeyForStream(s)) ++
              matcher.streamKeys
          val perEntry = entries.distinct.map { case (s, pk) =>
            val pid = Ids.partitionIdFor(Ids.partitionHash(pk), es.numPartitions)
            col("stream_id") === s &&
              col("partition_key") === pk.toString &&
              col("partition_id") === pid
          }
          Some(perEntry.reduce(_ || _))
        } else None
      val partFilter =
        if (matcher.allPartitions) None
        else if (matcher.partitions.nonEmpty)
          Some(col("partition_id").isin(matcher.partitions: _*))
        else None
      (streamFilter.toSeq ++ partFilter.toSeq)
        .reduceOption(_ && _).map(src.where).getOrElse(src)
    }

    val streamMode = matcher.streamNames.nonEmpty
    val cursorCol =
      if (streamMode) col("stream_version") else col("partition_sequence")
    // stream cursors are per (partition_key, stream) — key the lookup
    // the same way the matcher filters, so explicit-key entries get
    // their own head, not the default key's
    val keyCol =
      if (streamMode) concat(col("partition_key"), lit(":"), col("stream_id"))
      else col("partition_id").cast("string")

    from match {
      case From.Latest =>
        // live only: drop everything at or below the head snapshot
        val heads: Map[String, Long] =
          if (streamMode) {
            val entries = matcher.streams.map(s => s -> Ids.partitionKeyForStream(s)) ++
              matcher.streamKeys
            entries.map { case (s, pk) =>
              s"$pk:$s" -> es.sver(s, Some(pk)).getOrElse(-1L)
            }.toMap
          } else
            es.manifest.watermarks.map { case (p, w) => p.toString -> w }
        matched.where(cursorCol > headLookup(heads, keyCol, -1L))
      case From.Value(v) =>
        matched.where(cursorCol >= v)
      case From.PerKey(m, default) =>
        // MAP entries are keyed by stream name (partition id for
        // EPSUB); a subscribed key absent from the map (and no
        // DEFAULT) is unbounded — full history delivers
        // (`subscription.rs:189-194`)
        val mapKeyCol =
          if (streamMode) col("stream_id") else col("partition_id").cast("string")
        matched.where(cursorCol >= headLookup(m, mapKeyCol, default.getOrElse(Long.MinValue)))
    }
  }

  // CASE chain while small, one map literal at high key counts —
  // a FROM MAP over the reference's 50k-partition topology must not
  // become a 100k-node filter expression (`functions.keyedLookup`).
  private def headLookup(m: Map[String, Long], key: org.apache.spark.sql.Column,
      default: Long): org.apache.spark.sql.Column =
    graft.functions.functions.keyedLookup(m, key, default)

  /** Ordered delivery into a callback, one micro-batch at a time —
    * within a batch, events arrive ordered by (key, cursor) like the
    * reference's per-subscription ordered push. The checkpoint commit
    * after each callback IS the ack (EACK): throwing from `onEvents`
    * nacks the batch and it is redelivered on restart.
    */
  def deliver(
      subscription: DataFrame,
      checkpoint: String,
      byStream: Boolean)(onEvents: Seq[Row] => Unit): StreamingQuery =
    subscription.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the sort stays DISTRIBUTED deliberately: a driver-side sort
        // after collect was measured SLOWER at 10× (8.9× vs 6.4×
        // scale ratio — one boxed single-threaded sort of a
        // million-row batch loses to the cluster sort, even paying
        // the range-sampling job per trigger); the collect itself is
        // the contract — delivered rows must reach the consumer
        val ordered =
          if (byStream) batch.orderBy(col("stream_id"), col("stream_version"))
          else batch.orderBy(col("partition_id"), col("partition_sequence"))
        onEvents(ordered.collect().toIndexedSeq)
      }
      .start()
}
