package graft.core

import java.util.UUID
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Ports the UUID invariant tests from the reference
  * (`crates/sierradb/src/id.rs:107-188`).
  */
class IdsSpec extends AnyFunSuite with graft.PropHelpers {

  test("namespace constant equals UUIDv5(DNS, sierradb.tqwewe.com)") {
    assert(Ids.uuidV5Dns("sierradb.tqwewe.com") == Ids.NamespacePartitionKey)
  }

  test("uuidV5 is deterministic and version/variant tagged") {
    val a = Ids.partitionKeyForStream("my-stream")
    val b = Ids.partitionKeyForStream("my-stream")
    assert(a == b)
    assert(a.version() == 5)
    assert(a.variant() == 2)
  }

  test("v7 event id embeds and roundtrips the partition hash") {
    forAllSampled(Gen.chooseNum(0, 0xffff), Gen.chooseNum(0L, (1L << 48) - 1)) {
      (h: Int, ts: Long) =>
        val id = Ids.uuidV7WithPartitionHash(h, ts, 0xabc, 123456789L)
        assert(Ids.partitionHash(id) == h)
        assert(Ids.timestampMs(id) == ts)
        // the reference's layout puts the version nibble at bits 67..64
        // (not the RFC position), so check the raw bits, not UUID.version()
        assert((id.getMostSignificantBits & 0xfL) == 7L)
        assert(id.variant() == 2)
    }
  }

  test("partition id is hash mod numPartitions") {
    forAllSampled(Gen.alphaNumStr.suchThat(_.nonEmpty)) { sid: String =>
      val pid = Ids.partitionIdForStream(sid, 32)
      assert(pid >= 0 && pid < 32)
      assert(pid == Ids.partitionHashForStream(sid) % 32)
    }
  }

  test("event ids with same partition key route to same partition") {
    val pk = Ids.partitionKeyForStream("some-stream")
    val h = Ids.partitionHash(pk)
    val e1 = Ids.newEventId(h)
    val e2 = Ids.newEventId(h)
    assert(Ids.partitionIdForEventId(e1, 32) == Ids.partitionIdForEventId(e2, 32))
    assert(Ids.validateEventId(e1, h))
  }

  test("event id uniqueness across a burst") {
    val ids = (1 to 10000).map(_ => Ids.newEventId(7)).toSet
    assert(ids.size == 10000)
  }

  test("single-event transaction flag set/get/clear (bit 65)") {
    forAllSampled(org.scalacheck.Gen.zip(org.scalacheck.Arbitrary.arbitrary[Long], org.scalacheck.Arbitrary.arbitrary[Long])) { case (hi: Long, lo: Long) =>
      val u = new UUID(hi, lo)
      assert(Ids.singleEventFlag(Ids.withSingleEventFlag(u, true)))
      assert(!Ids.singleEventFlag(Ids.withSingleEventFlag(u, false)))
      // flag only touches bit 65
      val flagged = Ids.withSingleEventFlag(u, true)
      assert(flagged.getMostSignificantBits == hi)
      assert((flagged.getLeastSignificantBits & Long.MaxValue) == (lo & Long.MaxValue))
    }
  }

  test("partition hash distribution is roughly uniform over partitions") {
    val counts = (0 until 10000)
      .map(i => Ids.partitionIdForStream(s"stream-$i", 32))
      .groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 32)
    assert(counts.values.min > 150) // expected ~312 each
  }
}
