package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

/** Event / partition-key UUID machinery.
  *
  * Reimplements the reference's ID scheme (behavioral spec at
  * `crates/sierradb/src/id.rs:9-98`): event IDs are UUIDv7-like with a
  * 16-bit partition hash embedded at bits 46-61 of the 128-bit value, so
  * a point lookup (EGET) can route to exactly one partition without a
  * global index. Partition keys default to UUIDv5(namespace, stream_id).
  *
  * All functions are pure (timestamp/randomness passed in) so they can be
  * used inside deterministic Spark expressions and property tests.
  */
object Ids {

  /** Namespace for deriving partition keys from stream ids
    * (= UUIDv5(NAMESPACE_DNS, "sierradb.tqwewe.com"), `id.rs:9`).
    */
  val NamespacePartitionKey: UUID =
    UUID.fromString("219bd637-e279-53e9-9e2b-eabe5d9120cc")

  private val NamespaceDns: UUID =
    UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8")

  /** RFC 4122 UUIDv5 (SHA-1 name-based). */
  def uuidV5(namespace: UUID, name: Array[Byte]): UUID = {
    val md = MessageDigest.getInstance("SHA-1")
    val ns = new Array[Byte](16)
    putLongBE(ns, 0, namespace.getMostSignificantBits)
    putLongBE(ns, 8, namespace.getLeastSignificantBits)
    md.update(ns)
    md.update(name)
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // variant 10
    fromBytes(h)
  }

  def uuidV5Dns(name: String): UUID =
    uuidV5(NamespaceDns, name.getBytes(StandardCharsets.UTF_8))

  /** Default partition key for a stream (`eappend.rs:189-191`). */
  def partitionKeyForStream(streamId: String): UUID =
    uuidV5(NamespacePartitionKey, streamId.getBytes(StandardCharsets.UTF_8))

  /** Extract the embedded 16-bit partition hash (bits 46-61) from any
    * UUID (`id.rs:50-53`). For v5 partition keys these bits are
    * effectively SHA-1 output, i.e. uniformly distributed.
    */
  def partitionHash(uuid: UUID): Int = {
    val lo = uuid.getLeastSignificantBits
    ((lo >>> 46) & 0xffff).toInt
  }

  def partitionHashForStream(streamId: String): Int =
    partitionHash(partitionKeyForStream(streamId))

  /** `partition_id = partition_hash % num_partitions` (`eappend.rs:197`). */
  def partitionIdFor(pHash: Int, numPartitions: Int): Int =
    pHash % numPartitions

  def partitionIdForStream(streamId: String, numPartitions: Int): Int =
    partitionIdFor(partitionHashForStream(streamId), numPartitions)

  def partitionIdForEventId(eventId: UUID, numPartitions: Int): Int =
    partitionIdFor(partitionHash(eventId), numPartitions)

  /** UUIDv7-with-partition-hash (`id.rs:21-47`). Layout MSB→LSB:
    * 48-bit ms timestamp | 12 random bits | version 0x7 | variant 10 |
    * 16-bit partition hash | 46 random bits.
    */
  def uuidV7WithPartitionHash(
      pHash: Int,
      timestampMs: Long,
      rand12: Int,
      rand46: Long): UUID = {
    val hi = ((timestampMs & 0xffffffffffffL) << 16) |
      ((rand12 & 0x0fffL) << 4) | 0x7L
    val lo = (0x2L << 62) |
      ((pHash & 0xffffL) << 46) |
      (rand46 & ((1L << 46) - 1))
    new UUID(hi, lo)
  }

  def newEventId(pHash: Int): UUID = {
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    uuidV7WithPartitionHash(
      pHash,
      System.currentTimeMillis(),
      rnd.nextInt(1 << 12),
      rnd.nextLong() & ((1L << 46) - 1))
  }

  /** Milliseconds timestamp from a v7-style event id. */
  def timestampMs(eventId: UUID): Long =
    eventId.getMostSignificantBits >>> 16

  def validateEventId(eventId: UUID, pHash: Int): Boolean =
    partitionHash(eventId) == pHash

  /** Bit 65 (MSB of byte 8) flags a single-event transaction on a
    * transaction id (`id.rs:75-98`): no separate commit record needed.
    */
  def withSingleEventFlag(uuid: UUID, flag: Boolean): UUID = {
    val lo = uuid.getLeastSignificantBits
    val lo2 = if (flag) lo | Long.MinValue else lo & Long.MaxValue
    new UUID(uuid.getMostSignificantBits, lo2)
  }

  def singleEventFlag(uuid: UUID): Boolean =
    uuid.getLeastSignificantBits < 0

  private def putLongBE(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
  }

  private def fromBytes(b: Array[Byte]): UUID = {
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (b(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (b(i) & 0xffL); i += 1 }
    new UUID(hi, lo)
  }
}
