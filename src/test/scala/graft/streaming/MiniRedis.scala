package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** In-process RESP2 server speaking just enough Redis-Streams for the
  * queue-seam integration tests — the same test-double pattern as
  * SigningHttpsSpec's in-process HTTPS endpoint: the CLIENT code under
  * test is the production [[RespClient]]/`graft-redis` path, byte-for-
  * byte; only the far end of the socket is a fake.
  *
  * Implemented: PING, XADD (`*` and explicit ids), XRANGE (inclusive /
  * `(`-exclusive bounds, `-`/`+`, COUNT), XREVRANGE (latest-id form),
  * XLEN, XDEL, XINFO STREAM (`max-deleted-entry-id`, `length`,
  * `last-generated-id`). Auto ids are deterministic (`1-0`, `1-1`, …)
  * so specs never depend on wall-clock.
  */
final class MiniRedis {

  private case class Stream(
      entries: mutable.TreeMap[StreamId, Seq[(String, String)]] =
        mutable.TreeMap.empty,
      var lastGenerated: StreamId = StreamId.Zero,
      var maxDeleted: StreamId = StreamId.Zero)

  private val streams = mutable.Map.empty[String, Stream]
  private val server = new ServerSocket(0)
  @volatile private var running = true
  val port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: SocketException => () /* closed */ }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; server.close() }

  /** Test hook: delete ids ≤ upTo directly (an "operator" trimming out
    * of band — what the source's tripwire must catch when overdone). */
  def trimThrough(key: String, upTo: StreamId): Unit = synchronized {
    val st = streams.getOrElseUpdate(key, Stream())
    val doomed = st.entries.rangeTo(upTo).keys.toSeq
    doomed.foreach { id =>
      st.entries.remove(id)
      if (id > st.maxDeleted) st.maxDeleted = id
    }
  }

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      while (true) {
        val cmd = readCommand(in)
        val reply = synchronized(handle(cmd))
        out.write(reply.getBytes(UTF_8))
        out.flush()
      }
    } catch {
      case _: java.io.EOFException | _: SocketException => ()
    } finally sock.close()
  }

  private def readCommand(in: DataInputStream): Seq[String] = {
    def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      if (c < 0) throw new java.io.EOFException
      while (c != '\r') { sb.append(c.toChar); c = in.read() }
      in.read() // \n
      sb.toString
    }
    val first = line()
    require(first.startsWith("*"), s"expected RESP array, got $first")
    (0 until first.drop(1).toInt).map { _ =>
      val hdr = line()
      require(hdr.startsWith("$"), s"expected bulk, got $hdr")
      val n = hdr.drop(1).toInt
      val buf = new Array[Byte](n)
      in.readFully(buf)
      in.read(); in.read() // trailing \r\n
      new String(buf, UTF_8)
    }
  }

  private def bulk(s: String) = s"$$${s.getBytes(UTF_8).length}\r\n$s\r\n"
  private def entryReply(id: StreamId, fvs: Seq[(String, String)]): String = {
    val flat = fvs.flatMap { case (k, v) => Seq(k, v) }
    s"*2\r\n${bulk(id.toString)}*${flat.size}\r\n" + flat.map(bulk).mkString
  }

  /** Parse an XRANGE bound; returns (id, exclusive). */
  private def bound(s: String, low: Boolean): (StreamId, Boolean) = s match {
    case "-" => (StreamId.Zero, false)
    case "+" => (StreamId(Long.MaxValue, Long.MaxValue), false)
    case b if b.startsWith("(") => (parseBound(b.drop(1), low), true)
    case b => (parseBound(b, low), false)
  }
  /** A bare `ms` bound means `ms-0` at the low end, `ms-MAX` high. */
  private def parseBound(s: String, low: Boolean): StreamId =
    if (s.contains('-')) StreamId.parse(s)
    else if (low) StreamId(s.toLong, 0L)
    else StreamId(s.toLong, Long.MaxValue)

  private def handle(cmd: Seq[String]): String = cmd.head.toUpperCase match {
    case "PING" => "+PONG\r\n"
    case "XADD" =>
      val (key, idArg) = (cmd(1), cmd(2))
      val st = streams.getOrElseUpdate(key, Stream())
      val id = if (idArg == "*") {
        val g = st.lastGenerated
        if (g == StreamId.Zero) StreamId(1, 0) else StreamId(g.ms, g.seq + 1)
      } else StreamId.parse(idArg)
      if (id <= st.lastGenerated)
        return "-ERR The ID specified in XADD is equal or smaller than " +
          "the target stream top item\r\n"
      st.lastGenerated = id
      st.entries(id) = cmd.drop(3).grouped(2).map { p => p(0) -> p(1) }.toSeq
      bulk(id.toString)
    case "XRANGE" | "XREVRANGE" =>
      val rev = cmd.head.equalsIgnoreCase("XREVRANGE")
      val key = cmd(1)
      // XREVRANGE takes (end, start); normalize to (start, end)
      val (rawLo, rawHi) = if (rev) (cmd(3), cmd(2)) else (cmd(2), cmd(3))
      val count = cmd.drop(4) match {
        case Seq(c, n) if c.equalsIgnoreCase("COUNT") => Some(n.toInt)
        case _ => None
      }
      val st = streams.getOrElseUpdate(key, Stream())
      val (lo, loEx) = bound(rawLo, low = true)
      val (hi, hiEx) = bound(rawHi, low = false)
      var sel = st.entries.iteratorFrom(lo).takeWhile(_._1 <= hi).toSeq
      if (loEx) sel = sel.dropWhile(_._1 == lo)
      if (hiEx) sel = sel.takeWhile(_._1 != hi)
      if (rev) sel = sel.reverse
      val capped = count.fold(sel)(sel.take)
      s"*${capped.size}\r\n" +
        capped.map { case (id, fvs) => entryReply(id, fvs) }.mkString
    case "XLEN" =>
      s":${streams.getOrElseUpdate(cmd(1), Stream()).entries.size}\r\n"
    case "XDEL" =>
      val st = streams.getOrElseUpdate(cmd(1), Stream())
      var n = 0
      cmd.drop(2).map(StreamId.parse).foreach { id =>
        if (st.entries.remove(id).isDefined) {
          n += 1
          if (id > st.maxDeleted) st.maxDeleted = id
        }
      }
      s":$n\r\n"
    case "XINFO" if cmd(1).equalsIgnoreCase("STREAM") =>
      val st = streams.getOrElseUpdate(cmd(2), Stream())
      val kv = Seq(
        "length" -> s":${st.entries.size}\r\n",
        "last-generated-id" -> bulk(st.lastGenerated.toString),
        "max-deleted-entry-id" -> bulk(st.maxDeleted.toString))
      s"*${kv.size * 2}\r\n" + kv.map { case (k, v) => bulk(k) + v }.mkString
    case other => s"-ERR unknown command '$other'\r\n"
  }
}
