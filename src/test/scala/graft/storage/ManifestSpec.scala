package graft.storage

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class ManifestSpec extends AnyFunSuite with graft.PropHelpers {

  private val genState: Gen[ManifestState] = for {
    v <- Gen.chooseNum(0L, 1000L)
    np <- Gen.oneOf(1, 4, 32)
    wms <- Gen.mapOf(Gen.zip(Gen.chooseNum(0, 31), Gen.chooseNum(-1L, 1e9.toLong)))
    heads <- Gen.mapOf(Gen.zip(
      Gen.alphaNumStr.suchThat(s => s.nonEmpty && s.length <= 64),
      for {
        ver <- Gen.chooseNum(0L, 1e9.toLong)
        pid <- Gen.chooseNum(0, 31)
      } yield StreamHead(ver, java.util.UUID.randomUUID().toString, pid)))
  } yield ManifestState(v, np, wms, heads)

  test("render/parse round-trips") {
    forAllSampled(genState) { st =>
      assert(Manifest.parse(Manifest.render(st)) == st)
    }
  }

  test("escaped stream ids round-trip") {
    val st = ManifestState(1, 4, Map(0 -> 5L),
      Map("s\"quote" -> StreamHead(1, "pk", 0),
        "s\\back" -> StreamHead(2, "pk", 1),
        "s\ttab" -> StreamHead(3, "pk", 2)))
    assert(Manifest.parse(Manifest.render(st)) == st)
  }

  test("sequences past 2^53 round-trip exactly (no Double rounding)") {
    // 2^53 + 1 is the first Long a Double cannot represent
    val big = (1L << 53) + 1
    val st = ManifestState(big, 32, Map(7 -> big, 8 -> (Long.MaxValue - 1)),
      Map("pk:stream" -> StreamHead(big + 2, "pk", 7)),
      Map("ck" -> (big + 3)))
    val parsed = Manifest.parse(Manifest.render(st))
    assert(parsed == st)
    assert(parsed.watermarks(8) == Long.MaxValue - 1)
  }

  test("commit picks newest version on load") {
    val dir = Files.createTempDirectory("graft-mf-").toString
    assert(Manifest.load(dir).isEmpty)
    Manifest.commit(dir, ManifestState(1, 4, Map(0 -> 1L), Map.empty))
    Manifest.commit(dir, ManifestState(2, 4, Map(0 -> 9L), Map.empty))
    Manifest.commit(dir, ManifestState(10, 4, Map(0 -> 99L), Map.empty))
    assert(Manifest.load(dir).get.watermarks(0) == 99L)
  }

  test("retention: 10k commits leave at most Retain+1 manifest files") {
    val dir = Files.createTempDirectory("graft-mf-gc-").toString
    (1 to 10000).foreach { v =>
      Manifest.commit(dir, ManifestState(v.toLong, 4, Map(0 -> v.toLong), Map.empty))
    }
    val files = Files.list(Manifest.dirFor(dir))
    val names =
      try {
        import scala.jdk.CollectionConverters._
        files.iterator().asScala.map(_.getFileName.toString).toVector
      } finally files.close()
    assert(names.count(_.matches("v\\d+\\.json")) <= Manifest.Retain + 1, names.sorted.mkString(","))
    assert(names.forall(!_.endsWith(".tmp")))
    // newest survives and is the one load resolves
    assert(Manifest.load(dir).get.version == 10000L)
    assert(Manifest.load(dir).get.watermarks(0) == 10000L)
  }

  test("retention also sweeps stale temp files from crashed commits") {
    val dir = Files.createTempDirectory("graft-mf-tmp-").toString
    Manifest.commit(dir, ManifestState(1, 4, Map(0 -> 1L), Map.empty))
    // simulate a crash that left a temp file behind at an old version
    Files.write(Manifest.dirFor(dir).resolve(".v2.json.tmp"), Array[Byte](123))
    (3 to 40).foreach { v =>
      Manifest.commit(dir, ManifestState(v.toLong, 4, Map(0 -> v.toLong), Map.empty))
    }
    assert(!Files.exists(Manifest.dirFor(dir).resolve(".v2.json.tmp")))
    assert(Manifest.load(dir).get.version == 40L)
  }
}
