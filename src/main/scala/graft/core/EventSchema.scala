package graft.core

import org.apache.spark.sql.types._

/** The one schema: the event envelope
  * (reference: `crates/sierradb/src/bucket/segment/format.rs:129-141`).
  *
  * Timestamps are nanoseconds internally, milliseconds at the API
  * (`eappend.rs:198-214`, `request.rs:806`); Spark's TimestampType is
  * microseconds, so we store `timestamp_ns` as LONG and derive
  * TIMESTAMP / ms views on demand.
  */
object EventSchema {

  val PartitionIdCol = "partition_id"

  /** Envelope columns, in the reference's response encoding order
    * (`request.rs:798-812`).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("transaction_id", StringType, nullable = false),
    StructField("partition_key", StringType, nullable = false),
    StructField(PartitionIdCol, IntegerType, nullable = false),
    StructField("partition_sequence", LongType, nullable = false),
    StructField("stream_version", LongType, nullable = false),
    StructField("stream_id", StringType, nullable = false),
    StructField("event_name", StringType, nullable = false),
    StructField("timestamp_ns", LongType, nullable = false),
    StructField("metadata", BinaryType, nullable = true),
    StructField("payload", BinaryType, nullable = true)
  ))

  val columnNames: Seq[String] = schema.fields.map(_.name).toSeq
}

/** A fully-assigned event record (what the log stores). */
final case class Event(
    event_id: String,
    transaction_id: String,
    partition_key: String,
    partition_id: Int,
    partition_sequence: Long,
    stream_version: Long,
    stream_id: String,
    event_name: String,
    timestamp_ns: Long,
    metadata: Array[Byte],
    payload: Array[Byte])

/** Caller-supplied event before sequence/version assignment
  * (EAPPEND/EMAPPEND argument shape, `eappend.rs:47-96`).
  */
final case class EventInput(
    streamId: String,
    eventName: String,
    payload: Array[Byte] = Array.emptyByteArray,
    metadata: Array[Byte] = Array.emptyByteArray,
    expectedVersion: ExpectedVersion = ExpectedVersion.Any,
    eventId: Option[java.util.UUID] = None,
    timestampMs: Option[Long] = None)

/** EAPPEND response fields (`eappend.rs:267-278`). */
final case class AppendResult(
    eventId: String,
    partitionKey: String,
    partitionId: Int,
    partitionSequence: Long,
    streamVersion: Long,
    timestampMs: Long)

/** EMAPPEND response (`emappend.rs:277-303`). */
final case class MultiAppendResult(
    partitionKey: String,
    partitionId: Int,
    firstPartitionSequence: Long,
    lastPartitionSequence: Long,
    events: Seq[AppendResult])
