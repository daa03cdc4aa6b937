package graft.storage

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Commit manifest: the Spark-native analogue of SierraDB's confirmation
  * watermark (`crates/sierradb-cluster/src/confirmation.rs:83-156`,
  * `docs/Watermarks.md`). Readers only see events with
  * `partition_sequence <= watermark(partition)` — the gapless committed
  * prefix. A manifest version is committed by atomic rename, which gives
  * snapshot isolation for readers: they resolve the newest `v*.json`
  * once and every query in that snapshot is clamped consistently.
  *
  * Layout: `<root>/_manifest/v{N}.json`. Stream heads (the "live index"
  * role of `writer_thread_pool.rs:188-267`) are LSM-shaped so the
  * driver never holds more than a bounded overlay:
  *
  *   - `streamHeads` — the inline overlay: heads written since the last
  *     spill, bounded by the store's maxInlineHeads. Newest layer.
  *   - `headsDeltas` — versions of parquet delta tables at
  *     `<root>/_heads/delta-v{N}`, oldest first; each holds the heads
  *     spilled by one commit. Newer delta wins on key conflict.
  *   - `headsBase` — version of the folded parquet base table at
  *     `<root>/_heads/base-v{N}` (0 = none). Oldest layer.
  *
  * Parquet layers are written BEFORE the manifest commit that
  * references them (atomic rename), so a crash leaves at most an
  * unreferenced directory, deleted on next open. Watermarks stay
  * O(num_partitions) inline.
  */
final case class StreamHead(version: Long, partitionKey: String, partitionId: Int)

final case class ManifestState(
    version: Long,
    numPartitions: Int,
    // partition_id -> highest committed partition_sequence (-1 = empty)
    watermarks: Map[Int, Long],
    // inline head overlay: composite "pk:stream" key -> head state
    streamHeads: Map[String, StreamHead],
    // streaming-ingest idempotence: checkpoint id -> last applied batch
    // (a replayed foreachBatch after a crash between manifest commit and
    // checkpoint commit must be a no-op)
    streamBatchIds: Map[String, Long] = Map.empty,
    // parquet head-state layers (see scaladoc above)
    headsBase: Long = 0L,
    headsDeltas: Seq[Long] = Nil) {

  def watermark(pid: Int): Long = watermarks.getOrElse(pid, -1L)
}

object Manifest {
  private val Dir = "_manifest"

  /** Manifest versions retained after each commit. Readers resolve the
    * NEWEST `v*.json` exactly once per snapshot and then hold the parsed
    * state in memory — older files are never re-read — so retention only
    * has to keep the newest version unambiguous across the list/rename
    * race. Without GC every append adds a file forever and `load` (called
    * per read snapshot and per streaming trigger) lists O(commits)
    * entries; with it the directory stays O(Retain) at any command rate.
    */
  val Retain = 16

  /** Diagnostic counter of full snapshot reads (list + read + parse).
    * Tests assert hot paths (e.g. the optimizer's head-lookup rewrite)
    * perform none.
    */
  val loads = new java.util.concurrent.atomic.AtomicLong(0)

  def dirFor(root: String): Path = Paths.get(root, Dir)

  /** Newest committed version NUMBER by directory listing alone — no
    * file read, no JSON parse. The cheap staleness probe that lets a
    * reader trust an in-memory snapshot of the same version.
    */
  def newestVersion(root: String): Option[Long] = {
    val dir = dirFor(root)
    if (!Files.isDirectory(dir)) return None
    val listing = Files.list(dir)
    try {
      val versions = listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.matches("v\\d+\\.json"))
        .map(_.stripPrefix("v").stripSuffix(".json").toLong)
        .toSeq
      if (versions.isEmpty) None else Some(versions.max)
    } finally listing.close()
  }

  def empty(numPartitions: Int): ManifestState =
    ManifestState(0L, numPartitions, Map.empty, Map.empty)

  /** Load the newest committed manifest version, if any.
    *
    * Concurrent-GC safe: between listing the directory and reading the
    * chosen file, another committer's `gc` may delete it (a reader that
    * stalls for > Retain commits). Falling back to the next-newest listed
    * version is still a consistent snapshot — it was the newest at some
    * point after this call began — and if every listed candidate vanished
    * the directory has advanced by > Retain versions, so re-listing
    * observes a strictly newer one and terminates.
    */
  @annotation.tailrec
  def load(root: String): Option[ManifestState] = {
    loads.incrementAndGet()
    val dir = dirFor(root)
    if (!Files.isDirectory(dir)) return None
    val listing = Files.list(dir)
    val files =
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+\\.json"))
        .toSeq
      finally listing.close()
    if (files.isEmpty) None
    else {
      val newestFirst = files.sortBy(p =>
        -p.getFileName.toString.stripPrefix("v").stripSuffix(".json").toLong)
      val read = newestFirst.iterator
        .map { p =>
          try Some(parse(Files.readString(p)))
          catch { case _: java.nio.file.NoSuchFileException => None }
        }
        .collectFirst { case Some(m) => m }
      read match {
        case some @ Some(_) => some
        case None           => load(root) // all candidates GC'd under us: re-list
      }
    }
  }

  /** Commit a new manifest version: write temp file + atomic rename. */
  def commit(root: String, state: ManifestState): Unit = {
    val dir = dirFor(root)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".v${state.version}.json.tmp")
    Files.write(tmp, render(state).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"v${state.version}.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    gc(dir, state.version)
  }

  /** Best-effort retention after a successful commit: drop `v*.json`
    * versions ≤ `newest - Retain` (and any stale temp files from crashed
    * commits in that range). Deletion failures are ignored — the next
    * commit retries, and a lingering old version is harmless because
    * readers always take the max.
    */
  private def gc(dir: Path, newest: Long): Unit =
    // Truly best-effort: the manifest rename has already succeeded when gc
    // runs, so NOTHING thrown here may escape and report a durably
    // committed append as failed. Concurrent gc can make the directory
    // iteration itself throw (DirectoryIteratorException /
    // UncheckedIOException on entries vanishing mid-walk), not just the
    // deletes — swallow all non-fatal failures; the next commit retries.
    try {
      val cutoff = newest - Retain
      if (cutoff < 0) return
      val listing = Files.list(dir)
      try listing.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        val ver =
          if (n.matches("v\\d+\\.json"))
            Some(n.stripPrefix("v").stripSuffix(".json").toLong)
          else if (n.matches("\\.v\\d+\\.json\\.tmp"))
            Some(n.stripPrefix(".v").stripSuffix(".json.tmp").toLong)
          else None
        ver.filter(_ <= cutoff).foreach { _ =>
          try Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () }
        }
      } finally listing.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  // --- minimal JSON codec (no external deps available offline) ---

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def render(m: ManifestState): String = {
    val wm = m.watermarks.toSeq.sorted
      .map { case (p, w) => s""""$p":$w""" }.mkString("{", ",", "}")
    val heads = m.streamHeads.toSeq.sortBy(_._1).map { case (sid, h) =>
      s""""${esc(sid)}":[${h.version},"${esc(h.partitionKey)}",${h.partitionId}]"""
    }.mkString("{", ",", "}")
    val batches = m.streamBatchIds.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val deltas = m.headsDeltas.mkString("[", ",", "]")
    s"""{"version":${m.version},"num_partitions":${m.numPartitions},""" +
      s""""watermarks":$wm,"stream_heads":$heads,"stream_batch_ids":$batches,""" +
      s""""heads_base":${m.headsBase},"heads_deltas":$deltas}"""
  }

  /** Tiny recursive-descent JSON parser for exactly what `render` emits.
    * Integral fields parse through Long directly: partition sequences /
    * watermarks must stay exact past 2^53, where a Double round-trip
    * would silently round and corrupt watermark clamping.
    */
  def parse(s: String): ManifestState = {
    val p = new JsonP(s)
    val obj = p.obj()
    def asLong(v: Any): Long = v match {
      case l: Long   => l
      case d: Double => d.toLong
      case other     => throw new IllegalArgumentException(s"not a number: $other")
    }
    val version = asLong(obj("version"))
    val np = asLong(obj("num_partitions")).toInt
    val wm = obj("watermarks").asInstanceOf[Map[String, Any]]
      .map { case (k, v) => k.toInt -> asLong(v) }
    val heads = obj("stream_heads").asInstanceOf[Map[String, Any]]
      .map { case (k, v) =>
        val arr = v.asInstanceOf[Vector[Any]]
        k -> StreamHead(
          asLong(arr(0)),
          arr(1).asInstanceOf[String],
          asLong(arr(2)).toInt)
      }
    val batches = obj.get("stream_batch_ids")
      .map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> asLong(v) })
      .getOrElse(Map.empty[String, Long])
    val headsBase = obj.get("heads_base").map(asLong).getOrElse(0L)
    val headsDeltas = obj.get("heads_deltas")
      .map(_.asInstanceOf[Vector[Any]].map(asLong).toSeq)
      .getOrElse(Nil)
    ManifestState(version, np, wm, heads, batches, headsBase, headsDeltas)
  }

  private final class JsonP(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = { ws(); require(s(i) == c, s"expected $c at $i"); i += 1 }
    def obj(): Map[String, Any] = {
      expect('{'); ws()
      val m = mutable.Map.empty[String, Any]
      if (s(i) == '}') { i += 1; return m.toMap }
      while (true) {
        val k = str(); expect(':'); m(k) = value(); ws()
        if (s(i) == ',') { i += 1 } else { expect('}'); return m.toMap }
      }
      m.toMap
    }
    private def arr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (s(i) == ']') { i += 1; return b.result() }
      while (true) {
        b += value(); ws()
        if (s(i) == ',') { i += 1 } else { expect(']'); return b.result() }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c   => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    def value(): Any = {
      ws()
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ =>
          val start = i
          while (i < s.length && "+-0123456789.eE".indexOf(s(i)) >= 0) i += 1
          val tok = s.substring(start, i)
          // integral → exact Long (sequences can exceed 2^53); only
          // fractional/exponent forms fall back to Double
          if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble
          else tok.toLong
      }
    }
  }
}
