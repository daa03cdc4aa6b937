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

  private def serve(sock: Socket): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    val writeLock = new Object
    val subs = new java.util.ArrayList[StreamingQuery]()

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
            val args = items.map {
              case b: Blob      => b.utf8
              case SimpleStr(s) => s
              case other        => other.toString
            }
            handle(args, send, subs)
          case _ =>
            send(SimpleErr("ERR expected array command"))
        }
      }
    } catch {
      case _: Exception => () // connection torn down
    } finally {
      subs.forEach(q => try q.stop() catch { case _: Exception => () })
      connections.remove(sock)
      try sock.close() catch { case _: Exception => () }
    }
  }

  private def handle(
      args: Seq[String],
      send: Frame => Unit,
      subs: java.util.ArrayList[StreamingQuery]): Unit = args.head match {
    // subscriptions: reply with the subscription id (simple string,
    // `esub.rs:234`), then stream push frames as batches commit
    case "ESUB" | "EPSUB" =>
      cmd.execute(args) match {
        case Left(err) => send(SimpleErr(err))
        case Right(df: org.apache.spark.sql.DataFrame) =>
          val subId = UUID.randomUUID().toString
          val byStream = args.head == "ESUB"
          send(SimpleStr(subId))
          val ck = java.nio.file.Files
            .createTempDirectory(s"graft-sub-$subId").toString
          val q = graft.streaming.Subscriptions.deliver(df, ck, byStream) { rows =>
            rows.foreach { r =>
              val cursor =
                if (byStream) r.getAs[Long]("stream_version")
                else r.getAs[Long]("partition_sequence")
              send(PushF(Seq(
                SimpleStr("message"),
                SimpleStr(subId),
                Num(cursor),
                toFrame(cmd.encodeEvent(r)))))
            }
          }
          subs.add(q)
        case Right(other) => send(toFrame(other))
      }
    case _ =>
      cmd.execute(args) match {
        case Left(err) => send(SimpleErr(err))
        case Right(v)  => send(toFrame(v))
      }
  }

  /** Command-result value → RESP3 frame (the encode_event field maps
    * become RESP maps with blob-string keys, like `request.rs:798-812`).
    */
  private def toFrame(v: Any): Frame = v match {
    case null | None      => NullF
    case Some(x)          => toFrame(x)
    case "OK"             => SimpleStr("OK")
    case "PONG"           => SimpleStr("PONG")
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
