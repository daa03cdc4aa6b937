package graft.server

import java.io.{DataInputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** RESP3 wire codec — the subset the reference speaks
  * (`crates/sierradb-server/src/server.rs:142-231` uses the redis
  * `resp3` crate; frames observed on its wire: simple string/error,
  * blob string, number, double, boolean, null, array, map, push).
  * Requests are arrays of blob strings; responses are any frame.
  */
object Resp {

  sealed trait Frame
  final case class SimpleStr(s: String) extends Frame
  final case class SimpleErr(s: String) extends Frame
  final case class Blob(bytes: Array[Byte]) extends Frame {
    def utf8: String = new String(bytes, UTF_8)
    // structural equality: Array[Byte] in a case class compares by
    // reference otherwise
    override def equals(o: Any): Boolean = o match {
      case b: Blob => java.util.Arrays.equals(bytes, b.bytes)
      case _       => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
  }
  final case class Num(v: Long) extends Frame
  final case class Dbl(v: Double) extends Frame
  final case class Bool(v: Boolean) extends Frame
  case object NullF extends Frame
  final case class ArrayF(items: Seq[Frame]) extends Frame
  final case class MapF(entries: Seq[(Frame, Frame)]) extends Frame
  final case class PushF(items: Seq[Frame]) extends Frame

  def blob(s: String): Blob = Blob(s.getBytes(UTF_8))

  // ------------------------------------------------------------- encode

  def encode(f: Frame, out: OutputStream): Unit = {
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    f match {
      case SimpleStr(s) => w(s"+$s\r\n")
      case SimpleErr(s) => w(s"-$s\r\n")
      case Blob(b)      => w(s"$$${b.length}\r\n"); out.write(b); w("\r\n")
      case Num(v)       => w(s":$v\r\n")
      case Dbl(v)       => w(s",$v\r\n")
      case Bool(v)      => w(if (v) "#t\r\n" else "#f\r\n")
      case NullF        => w("_\r\n")
      case ArrayF(xs)   => w(s"*${xs.length}\r\n"); xs.foreach(encode(_, out))
      case PushF(xs)    => w(s">${xs.length}\r\n"); xs.foreach(encode(_, out))
      case MapF(es) =>
        w(s"%${es.length}\r\n")
        es.foreach { case (k, v) => encode(k, out); encode(v, out) }
    }
  }

  // ------------------------------------------------------------- decode

  /** Hard protocol limits — a malicious LENGTH HEADER must fail fast,
    * before any allocation or element loop sized by it (the reference
    * fuzzes its command parser for exactly this class of input,
    * `fuzz/fuzz_targets/commands.rs`). Blob cap mirrors redis's
    * proto-max-bulk-len default.
    */
  val MaxBlobLen: Long = 512L * 1024 * 1024
  val MaxContainerLen: Long = 1 << 20
  val MaxDepth: Int = 32
  val MaxLineLen: Int = 64 * 1024

  private def protoErr(msg: String): Nothing =
    throw new java.io.IOException(s"RESP protocol violation: $msg")

  /** Blocking frame read; throws EOFException at clean end-of-stream,
    * IOException (or a parse exception) on malformed/hostile input —
    * never an unbounded allocation, unbounded loop, or stack overflow.
    */
  def decode(in: InputStream): Frame = {
    val din = in match {
      case d: DataInputStream => d
      case other              => new DataInputStream(other)
    }
    readFrame(din, 0)
  }

  private def readFrame(in: DataInputStream, depth: Int): Frame = {
    if (depth > MaxDepth) protoErr(s"nesting deeper than $MaxDepth")
    val t = in.read()
    if (t < 0) throw new EOFException()
    def count(): Int = {
      val n = readLine(in).toLong
      if (n > MaxContainerLen) protoErr(s"container length $n")
      math.max(0L, n).toInt
    }
    t.toChar match {
      case '+' => SimpleStr(readLine(in))
      case '-' => SimpleErr(readLine(in))
      case ':' => Num(readLine(in).toLong)
      case ',' => Dbl(readLine(in).toDouble)
      case '#' => val b = readLine(in); Bool(b == "t")
      case '_' => readLine(in); NullF
      case '$' =>
        val n = readLine(in).toLong
        if (n < 0) NullF
        else if (n > MaxBlobLen) protoErr(s"blob length $n")
        else {
          val buf = new Array[Byte](n.toInt)
          in.readFully(buf)
          readLine(in) // trailing CRLF
          Blob(buf)
        }
      case '*' => ArrayF(Seq.fill(count())(readFrame(in, depth + 1)))
      case '>' => PushF(Seq.fill(count())(readFrame(in, depth + 1)))
      case '%' =>
        MapF(Seq.fill(count())((readFrame(in, depth + 1), readFrame(in, depth + 1))))
      case other =>
        protoErr(s"unsupported type byte: '$other'")
    }
  }

  private def readLine(in: DataInputStream): String = {
    // collect raw bytes and decode ONCE as UTF-8 — per-byte toChar
    // would mojibake any multi-byte content in simple strings/errors
    val buf = new java.io.ByteArrayOutputStream(32)
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException()
      if (buf.size() >= MaxLineLen) protoErr(s"line longer than $MaxLineLen")
      buf.write(c)
      c = in.read()
    }
    require(in.read() == '\n', "malformed RESP line terminator")
    new String(buf.toByteArray, UTF_8)
  }
}
