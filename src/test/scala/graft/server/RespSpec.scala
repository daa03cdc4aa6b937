package graft.server

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, IOException}

import graft.PropHelpers
import graft.server.Resp._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level robustness of the RESP frame decoder, mirroring the
  * reference's parser fuzzing (`fuzz/fuzz_targets/commands.rs`):
  * arbitrary, truncated, and hostile byte streams must produce a frame
  * or a clean exception (→ connection close in RespServer) — never a
  * hang, unbounded allocation, stack overflow, or thread death.
  */
class RespSpec extends AnyFunSuite with PropHelpers {

  private def encodeBytes(f: Frame): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    Resp.encode(f, out)
    out.toByteArray
  }

  private def decodeBytes(b: Array[Byte]): Frame =
    Resp.decode(new ByteArrayInputStream(b))

  /** decode either yields a frame or throws one of the sanctioned
    * exception types; anything else (Error, hang) fails the property.
    */
  private def decodeSafely(b: Array[Byte]): Unit =
    try { decodeBytes(b); () }
    catch {
      case _: EOFException | _: IOException => ()
      case _: NumberFormatException         => ()
      case _: IllegalArgumentException      => ()
    }

  // ---------------------------------------------------------- generators

  private val genSimpleText: Gen[String] =
    Gen.listOf(Gen.asciiPrintableChar).map(_.mkString) // no \r\n by construction

  private val genLeaf: Gen[Frame] = Gen.oneOf(
    genSimpleText.map(SimpleStr),
    genSimpleText.map(SimpleErr),
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue)).map(Blob(_)),
    Gen.choose(Long.MinValue, Long.MaxValue).map(Num),
    Gen.choose(-1e12, 1e12).map(Dbl),
    Gen.oneOf(true, false).map(Bool),
    Gen.const(NullF))

  private def genFrame(depth: Int): Gen[Frame] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      1 -> Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, genFrame(depth - 1)).map(ArrayF(_))),
      1 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, genFrame(depth - 1)).map(PushF(_))),
      1 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(genFrame(depth - 1), genFrame(depth - 1)))
          .map(MapF(_))))

  // ---------------------------------------------------------- properties

  test("round trip: decode(encode(frame)) == frame") {
    forAllSampled(genFrame(3)) { f =>
      assert(decodeBytes(encodeBytes(f)) == f)
    }
  }

  test("arbitrary byte garbage: frame or clean exception, never a hang") {
    forAllSampled(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue)),
      runs = 500)(decodeSafely)
  }

  test("garbage behind a valid type byte") {
    val typed = for {
      t <- Gen.oneOf('+', '-', ':', ',', '#', '_', '$', '*', '>', '%')
      rest <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield t.toByte +: rest
    forAllSampled(typed, runs = 500)(decodeSafely)
  }

  test("truncation at every prefix of a valid frame still fails cleanly") {
    forAllSampled(genFrame(2), runs = 50) { f =>
      val full = encodeBytes(f)
      (0 until full.length).foreach(n => decodeSafely(full.take(n)))
    }
  }

  test("hostile length headers fail fast without allocation") {
    // 2 GB blob announcement backed by 3 bytes: must throw before
    // allocating, not readFully into a 2 GB buffer
    val t0 = System.nanoTime()
    intercept[IOException](decodeBytes(s"$$2147483647\r\nabc".getBytes("UTF-8")))
    intercept[IOException](decodeBytes(s"$$${Long.MaxValue}\r\n".getBytes("UTF-8")))
    intercept[IOException](decodeBytes(s"*2147483647\r\n".getBytes("UTF-8")))
    intercept[IOException](decodeBytes(s"%2147483647\r\n".getBytes("UTF-8")))
    assert((System.nanoTime() - t0) < 2e9, "length-bomb rejection must be immediate")
  }

  test("nesting bombs throw IOException, not StackOverflowError") {
    val bomb = ("*1\r\n" * 10000).getBytes("UTF-8")
    intercept[IOException](decodeBytes(bomb))
    val pushBomb = (">1\r\n" * 10000).getBytes("UTF-8")
    intercept[IOException](decodeBytes(pushBomb))
  }

  test("oversized line headers are bounded") {
    val longLine = ("+" + "a" * (Resp.MaxLineLen + 10) + "\r\n").getBytes("UTF-8")
    intercept[IOException](decodeBytes(longLine))
  }

  test("negative blob length is RESP2 null; negative counts are empty") {
    assert(decodeBytes("$-1\r\n".getBytes("UTF-8")) == NullF)
    assert(decodeBytes("*-1\r\n".getBytes("UTF-8")) == ArrayF(Nil))
  }
}
