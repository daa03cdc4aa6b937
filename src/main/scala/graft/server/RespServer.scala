package graft.server

import java.net.{InetAddress, ServerSocket, Socket}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import graft.api.{Commands, EventStore}
import graft.server.Resp._
import org.apache.spark.sql.streaming.StreamingQuery

/** RESP3 TCP endpoint over the Commands facade — the last mile of the
  * reference's server (`crates/sierradb-server/src/server.rs:142-231`):
  * requests are RESP arrays of blob strings, responses are RESP3
  * frames, subscriptions switch the connection into push mode with
  * `>4 [message, subscription_id, cursor, event]` frames exactly like
  * `send_subscription_event` (`server.rs:236-263`).
  *
  * Threading: one accept thread, one thread per connection (the
  * reference is one tokio task per connection); subscription pushes
  * come from the streaming micro-batch thread and synchronize on the
  * socket's output stream.
  */
final class RespServer(es: EventStore, port: Int = 0) {

  private val cmd = new Commands(es)
  private val server = new ServerSocket(port, 50, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  private val connections = ConcurrentHashMap.newKeySet[Socket]()

  def localPort: Int = server.getLocalPort

  def start(): RespServer = {
    val t = new Thread(() => acceptLoop(), "graft-resp-accept")
    t.setDaemon(true)
    t.start()
    this
  }

  def stop(): Unit = {
    running = false
    connections.forEach(s => try s.close() catch { case _: Exception => () })
    try server.close() catch { case _: Exception => () }
  }

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val sock = server.accept()
        connections.add(sock)
        val t = new Thread(() => serve(sock), s"graft-resp-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => if (!running) return }
    }

  /** Per-subscription ack-window state (`subscription.rs:441-461`):
    * `cursor` counts delivered events; delivery BLOCKS while the
    * unacked gap exceeds the window, and EACK advances `lastAck`.
    */
  private final class SubState(val window: Long) {
    var cursor: Long = 0L
    var lastAck: Long = -1L
    @volatile var closed = false
  }

  private def serve(sock: Socket): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    val writeLock = new Object
    val subs = new java.util.ArrayList[(StreamingQuery, java.nio.file.Path)]()
    val subStates = new java.util.concurrent.ConcurrentHashMap[String, SubState]()

    def send(f: Frame): Unit = writeLock.synchronized {
      Resp.encode(f, out)
      out.flush()
    }

    try {
      while (running && !sock.isClosed) {
        val frame =
          try Resp.decode(in)
          catch { case _: java.io.EOFException => return }
        frame match {
          case ArrayF(items) if items.nonEmpty =>
            // keep the raw blob bytes: PAYLOAD/METADATA are opaque
            // binary in the reference (`eappend.rs:55`) and a lossy
            // utf8 decode here would corrupt them before Commands
            // ever sees them
            val raw = items.map {
              case b: Blob      => b.bytes
              case SimpleStr(s) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              case other        => other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            }
            handle(raw, send, subs, subStates)
          case _ =>
            send(SimpleErr("ERR expected array command"))
        }
      }
    } catch {
      case _: Exception => () // connection torn down
    } finally {
      subStates.forEach { (_, st) =>
        st.synchronized { st.closed = true; st.notifyAll() }
      }
      subs.forEach { case (q, ck) =>
        try q.stop() catch { case _: Exception => () }
        // a subscription's checkpoint dies with its connection — the
        // dirs would otherwise accumulate one per ESUB forever
        try deleteRecursively(ck.toFile) catch { case _: Exception => () }
      }
      connections.remove(sock)
      try sock.close() catch { case _: Exception => () }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.core.Fs.deleteRecursively(f)

  private def handle(
      raw: Seq[Array[Byte]],
      send: Frame => Unit,
      subs: java.util.ArrayList[(StreamingQuery, java.nio.file.Path)],
      subStates: java.util.concurrent.ConcurrentHashMap[String, SubState]): Unit = {
    // UTF-8 view ONLY where the grammar needs it: the command word for
    // dispatch here, and the full array for the subscription/ack grammar
    // below (pure text by construction). EAPPEND/EMAPPEND blobs flow raw
    // into executeRaw without ever being String-decoded on this path.
    def argsText = raw.map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
    new String(raw.head, java.nio.charset.StandardCharsets.UTF_8) match {
      // subscriptions: reply with the subscription id (simple string,
      // `esub.rs:234`), then stream push frames as batches commit —
      // each delivery waits for ack-window room first
      case subCmd @ ("ESUB" | "EPSUB") =>
        cmd.executeRaw(raw) match {
          case Left(err) => send(SimpleErr(err))
          case Right(df: org.apache.spark.sql.DataFrame) =>
            val subId = UUID.randomUUID().toString
            val byStream = subCmd == "ESUB"
            // same parser as the command itself — WINDOW is positional
            // grammar, not any token that happens to spell "WINDOW"
            val window = cmd.subscriptionWindow(argsText.tail).toLong
            val st = new SubState(window)
            subStates.put(subId, st)
            send(SimpleStr(subId))
            val ck = java.nio.file.Files.createTempDirectory(s"graft-sub-$subId")
            val q = graft.streaming.Subscriptions.deliver(df, ck.toString, byStream) { rows =>
              rows.foreach { r =>
                // `send_record`: wait until gap <= window (no ack yet →
                // gap counts from zero), then push and advance cursor
                val c = st.synchronized {
                  def gap = if (st.lastAck < 0) st.cursor + 1 else st.cursor - st.lastAck
                  while (gap > st.window && !st.closed) st.wait(100)
                  if (st.closed) throw new InterruptedException("subscription closed")
                  val c0 = st.cursor; st.cursor += 1; c0
                }
                send(PushF(Seq(
                  SimpleStr("message"),
                  SimpleStr(subId),
                  Num(c),
                  toFrame(cmd.encodeEvent(r)))))
              }
            }
            subs.add((q, ck))
          case Right(other) => send(toFrame(other))
        }
      // EACK subscription_id cursor: advance the ack window and wake
      // any delivery blocked on it
      case "EACK" =>
        argsText match {
          case Seq("EACK", subId, cursorStr) =>
            (Option(subStates.get(subId)), cursorStr.toLongOption) match {
              case (Some(st), Some(cur)) =>
                st.synchronized {
                  st.lastAck = math.max(st.lastAck, cur)
                  st.notifyAll()
                }
                send(SimpleStr("OK"))
              case _ =>
                // unknown subscription / non-numeric cursor: keep the
                // facade's lenient OK/ERR behavior (OK is a simple
                // string by protocol position)
                cmd.execute(argsText) match {
                  case Left(e)          => send(SimpleErr(e))
                  case Right(s: String) => send(SimpleStr(s))
                  case Right(v)         => send(toFrame(v))
                }
            }
          case _ => send(SimpleErr("ERR EACK requires subscription_id cursor"))
        }
      case _ =>
        cmd.executeRaw(raw) match {
          case Left(err) => send(SimpleErr(err))
          // PING's PONG (and the facade's bare-OK acks) are simple
          // strings by protocol position, not by VALUE — data fields
          // that happen to contain "OK"/"PONG" must stay blobs
          case Right(s: String) => send(SimpleStr(s))
          case Right(v)         => send(toFrame(v))
        }
    }
  }

  /** Command-result value → RESP3 frame (the encode_event field maps
    * become RESP maps with blob-string keys, like `request.rs:798-812`).
    */
  private def toFrame(v: Any): Frame = v match {
    case null | None      => NullF
    case Some(x)          => toFrame(x)
    case s: String        => blob(s)
    case b: Boolean       => Bool(b)
    case i: Int           => Num(i)
    case l: Long          => Num(l)
    case d: Double        => Dbl(d)
    case b: Array[Byte]   => Blob(b)
    case m: Map[_, _]     =>
      MapF(m.toSeq.map { case (k, x) => (blob(k.toString), toFrame(x)) })
    case s: Seq[_]        => ArrayF(s.map(toFrame))
    case other            => blob(other.toString)
  }
}
