package graft.streaming

import java.nio.file.Files

import graft.api.EventStore
import graft.core.EventInput
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** White-box coverage of the sequence-offset source: canonical offset
  * JSON, event-budget rate limiting with rotation, and (start, end]
  * batch bounds — the mechanics the engine-level SubscriptionsSpec
  * exercises only indirectly.
  */
class GraftEventSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // getBatch plans are isStreaming=true; allow batch actions on them
    // for white-box inspection (the trick Spark's own source tests use)
    .config("spark.sql.streaming.unsupportedOperationCheck", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("offset json is canonical and round-trips") {
    val o = SeqVectorOffset(Map(7 -> 59L, 0 -> 3L, 12 -> 0L))
    assert(o.json == """{"0":3,"7":59,"12":0}""")
    assert(SeqVectorOffset.parse(o.json) == o)
    assert(SeqVectorOffset.parse("{}") == SeqVectorOffset.empty)
  }

  test("budget caps each offer in events; offers converge to the watermarks") {
    val dir = Files.createTempDirectory("graft-src-").toString
    val es = EventStore.open(spark, dir, 4)
    // two streams in (very likely) different partitions, 5 events each
    (1 to 5).foreach(_ => es.append(EventInput("src-a", "E")))
    (1 to 5).foreach(_ => es.append(EventInput("src-b", "E")))
    val wm = es.manifest.watermarks.filter(_._2 >= 0)
    val totalEvents = wm.values.map(_ + 1).sum

    val src = new GraftEventSource(spark, dir, maxEventsPerTrigger = Some(3L))
    var last: Option[SeqVectorOffset] = None
    var offers = 0
    var progressed = true
    while (progressed && offers < 20) {
      val next = src.getOffset.map(SeqVectorOffset.of)
      progressed = next != last
      next.foreach { n =>
        // each offer advances at most 3 events past the previous one
        val prevTotal = last.map(_.seqs.values.map(_ + 1).sum).getOrElse(0L)
        val nextTotal = n.seqs.values.map(_ + 1).sum
        assert(nextTotal - prevTotal <= 3L)
        // batch bound check: (start, end] row count equals the advance
        val batch = src.getBatch(last, n)
        assert(batch.count() == nextTotal - prevTotal)
        last = Some(n)
      }
      offers += 1
    }
    // converged to exactly the committed watermarks, nothing dropped
    assert(last.map(_.seqs).contains(wm))
    assert(last.get.seqs.values.map(_ + 1).sum == totalEvents)
  }
}
