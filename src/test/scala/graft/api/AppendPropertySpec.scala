package graft.api

import java.nio.file.Files

import graft.core._
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Model-based property tests of the append path, porting the
  * reference's proptest suite (`writer_thread_pool.rs:1560-1830`):
  * random batches of events with random expected versions are applied
  * both to the store and to a trivial in-memory model; outcomes and
  * head states must agree, and sequences must stay gapless. Plus a
  * multi-threaded append race: the per-store lock must serialize
  * writers like the reference's single writer thread per bucket.
  */
class AppendPropertySpec extends AnyFunSuite with BeforeAndAfterAll
    with graft.PropHelpers {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // generators mirroring the reference's (`arb_stream_id`, etc.)
  private val genStreamId: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const('_')))
  } yield (h :: t).mkString

  private val genExpected: Gen[ExpectedVersion] = Gen.oneOf(
    Gen.const(ExpectedVersion.Any),
    Gen.const(ExpectedVersion.Exists),
    Gen.const(ExpectedVersion.Empty),
    Gen.chooseNum(0L, 5L).map(ExpectedVersion.Exact(_)))

  private val genBatch: Gen[List[EventInput]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, for {
      sid <- genStreamId
      ev <- genExpected
    } yield EventInput(sid, "PropEvt", expectedVersion = ev)))

  test("random append batches agree with the in-memory model") {
    val es = EventStore.open(
      spark, Files.createTempDirectory("graft-prop-").toString, 8)
    val model = collection.mutable.Map.empty[String, Long] // head versions

    forAllSampled(genBatch, runs = 40) { batch =>
      val results = es.appendMany(batch)
      // apply the same semantics to the model
      results.zip(batch).foreach { case (r, in) =>
        val current = CurrentVersion.fromOption(model.get(in.streamId))
        val expectOk = in.expectedVersion.gapFrom(current) == VersionGap.None
        assert(r.isRight == expectOk,
          s"store=${r.isLeft} model=${!expectOk} for ${in.streamId} " +
            s"${in.expectedVersion} vs $current")
        if (expectOk) {
          val v = current.next
          model(in.streamId) = v
          assert(r.toOption.get.streamVersion == v)
        }
      }
      // store heads == model heads for every touched stream
      batch.map(_.streamId).distinct.foreach { sid =>
        assert(es.sver(sid) == model.get(sid))
      }
    }

    // final global invariant: gapless per-partition sequences
    import org.apache.spark.sql.functions._
    es.events().groupBy(col("partition_id"))
      .agg(count(lit(1)).as("n"), max(col("partition_sequence")).as("hi"),
        countDistinct(col("partition_sequence")).as("d"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
        assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
      }
  }

  test("concurrent appenders: serialized writes keep sequences gapless") {
    val es = EventStore.open(
      spark, Files.createTempDirectory("graft-conc-").toString, 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 8).map { t =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int =
            (0 until 25).count(i => es.append(
              EventInput(s"conc-${t % 3}", s"e$t-$i")).isRight)
        })
      }
      val ok = futures.map(_.get()).sum
      assert(ok == 200) // Any expectation: every append succeeds
    } finally pool.shutdown()

    assert((0 until 3).map(i => es.sver(s"conc-$i").get + 1).sum == 200)
    import org.apache.spark.sql.functions._
    es.events().groupBy(col("stream_id"))
      .agg(count(lit(1)).as("n"), max(col("stream_version")).as("hi"),
        countDistinct(col("stream_version")).as("d"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
        assert(r.getAs[Long]("d") == r.getAs[Long]("n"))
      }
  }
}
