package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal RESP2 (REdis Serialization Protocol) codec + synchronous
  * client — the wire-level counterpart of the reference's redis-py
  * usage (redis_client.py:50 XADD, :111 XRANGE, :193 XDEL). Only the
  * protocol surface the queue seam needs is implemented: command
  * arrays out, the five RESP2 reply types back. RESP2 is the lingua
  * franca every Redis-compatible server speaks before any HELLO
  * negotiation, so this client never sends HELLO and works against
  * Redis ≥ 5 and all stream-capable clones.
  *
  * Thread-safety: one client = one socket = one in-flight command
  * (call sites are per-Spark-task or driver-side planning, each of
  * which owns its own client instance).
  */
object Resp {

  sealed trait Reply
  /** `+OK` */ final case class Simple(s: String) extends Reply
  /** `-ERR …` */ final case class Err(msg: String) extends Reply
  /** `:42` */ final case class Num(n: Long) extends Reply
  /** `$n…` (None = null bulk) */ final case class Bulk(s: Option[String]) extends Reply
  /** `*n…` (None = null array) */ final case class Arr(items: Option[Seq[Reply]]) extends Reply

  /** Encode one command as a RESP array of bulk strings — the only
    * request shape clients send. */
  def encode(args: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append('*').append(args.size).append("\r\n")
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      sb.append('$').append(b.length).append("\r\n").append(a).append("\r\n")
    }
    sb.toString.getBytes(UTF_8)
  }

  private def readLine(in: DataInputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("RESP stream closed mid-reply")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n')
      throw new java.io.IOException("RESP line not CRLF-terminated")
    sb.toString
  }

  def readReply(in: DataInputStream): Reply = in.read() match {
    case '+' => Simple(readLine(in))
    case '-' => Err(readLine(in))
    case ':' => Num(readLine(in).toLong)
    case '$' =>
      val n = readLine(in).toInt
      if (n < 0) Bulk(None)
      else {
        val buf = new Array[Byte](n)
        in.readFully(buf)
        if (in.read() != '\r' || in.read() != '\n')
          throw new java.io.IOException("RESP bulk not CRLF-terminated")
        Bulk(Some(new String(buf, UTF_8)))
      }
    case '*' =>
      val n = readLine(in).toInt
      if (n < 0) Arr(None)
      else Arr(Some((0 until n).map(_ => readReply(in))))
    case -1 => throw new EOFException("RESP stream closed")
    case c => throw new java.io.IOException(s"unknown RESP type byte '${c.toChar}'")
  }
}

/** A Redis stream entry id — `ms-seq` (e.g. `1526985054069-3`), the
  * stream's total order. Comparable so offsets/trim bounds are plain
  * ordering. */
final case class StreamId(ms: Long, seq: Long) extends Ordered[StreamId] {
  override def compare(that: StreamId): Int = {
    val c = java.lang.Long.compare(ms, that.ms)
    if (c != 0) c else java.lang.Long.compare(seq, that.seq)
  }
  override def toString: String = s"$ms-$seq"
}

object StreamId {
  val Zero: StreamId = StreamId(0L, 0L)
  private val P = """(\d+)-(\d+)""".r
  def parse(s: String): StreamId = s match {
    case P(m, q) => StreamId(m.toLong, q.toLong)
    case other => throw new IllegalArgumentException(s"not a stream id: $other")
  }
}

/** Synchronous RESP client with the Redis-Streams verbs the queue seam
  * uses. Replies are checked: a server `-ERR` surfaces as an exception
  * (fail-loud, matching the repo's Verify/Bench contract), never a
  * silently-empty result. */
class RespClient(host: String, port: Int,
    connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 30000)
    extends AutoCloseable {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setSoTimeout(readTimeoutMs)
  socket.setTcpNoDelay(true)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))

  def command(args: String*): Resp.Reply = {
    out.write(Resp.encode(args))
    out.flush()
    Resp.readReply(in) match {
      case Resp.Err(msg) => throw new java.io.IOException(
        s"redis error for ${args.headOption.getOrElse("?")}: $msg")
      case r => r
    }
  }

  private def bulk(r: Resp.Reply): String = r match {
    case Resp.Bulk(Some(s)) => s
    case other => throw new java.io.IOException(s"expected bulk, got $other")
  }

  /** XADD (redis_client.py:50): append `fields` with server-assigned
    * (`*`) or explicit id; returns the assigned id. */
  def xadd(key: String, fields: Seq[(String, String)],
      id: String = "*"): StreamId = {
    val args = Seq("XADD", key, id) ++ fields.flatMap { case (k, v) => Seq(k, v) }
    StreamId.parse(bulk(command(args: _*)))
  }

  /** XRANGE (redis_client.py:111): entries in [start, end] (or
    * exclusive with a `(` prefix on either bound), optionally capped. */
  def xrange(key: String, start: String, end: String,
      count: Option[Int] = None): Seq[(StreamId, Seq[(String, String)])] = {
    val args = Seq("XRANGE", key, start, end) ++
      count.toSeq.flatMap(c => Seq("COUNT", c.toString))
    command(args: _*) match {
      case Resp.Arr(Some(entries)) => entries.map {
        case Resp.Arr(Some(Seq(idR, Resp.Arr(Some(fvs))))) =>
          val id = StreamId.parse(idR match {
            case Resp.Bulk(Some(s)) => s
            case Resp.Simple(s) => s
            case other => throw new java.io.IOException(s"bad entry id $other")
          })
          val pairs = fvs.grouped(2).map {
            case Seq(Resp.Bulk(Some(k)), Resp.Bulk(Some(v))) => k -> v
            case other => throw new java.io.IOException(s"bad field pair $other")
          }.toSeq
          id -> pairs
        case other => throw new java.io.IOException(s"bad XRANGE entry $other")
      }
      case Resp.Arr(None) => Seq.empty
      case other => throw new java.io.IOException(s"bad XRANGE reply $other")
    }
  }

  /** Highest id currently retained (XREVRANGE + - COUNT 1), if any. */
  def latestId(key: String): Option[StreamId] =
    command("XREVRANGE", key, "+", "-", "COUNT", "1") match {
      case Resp.Arr(Some(Seq(Resp.Arr(Some(Seq(Resp.Bulk(Some(id)), _)))))) =>
        Some(StreamId.parse(id))
      case Resp.Arr(Some(Seq())) | Resp.Arr(None) => None
      case other => throw new java.io.IOException(s"bad XREVRANGE reply $other")
    }

  /** XDEL (redis_client.py:193): returns how many ids were deleted. */
  def xdel(key: String, ids: Seq[StreamId]): Long =
    if (ids.isEmpty) 0L
    else command(("XDEL" +: key +: ids.map(_.toString)): _*) match {
      case Resp.Num(n) => n
      case other => throw new java.io.IOException(s"bad XDEL reply $other")
    }

  def xlen(key: String): Long = command("XLEN", key) match {
    case Resp.Num(n) => n
    case other => throw new java.io.IOException(s"bad XLEN reply $other")
  }

  /** `max-deleted-entry-id` from XINFO STREAM — the high-water mark of
    * every id ever XDEL'd/XTRIM'd (Redis ≥ 7). Zero means nothing was
    * ever deleted. This is the lost-data tripwire: a resume point below
    * it proves retention ran past the checkpoint. */
  def maxDeletedId(key: String): StreamId =
    command("XINFO", "STREAM", key) match {
      case Resp.Arr(Some(items)) =>
        val kv = items.grouped(2).collect {
          case Seq(Resp.Bulk(Some(k)), v) => k -> v
        }.toMap
        kv.get("max-deleted-entry-id") match {
          case Some(Resp.Bulk(Some(id))) => StreamId.parse(id)
          case _ => StreamId.Zero
        }
      case other => throw new java.io.IOException(s"bad XINFO reply $other")
    }

  override def close(): Unit = socket.close()
}
