package graft.streaming

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A2 live connector: the reference's WebSocket feed
  * (kalshi_ws_client.py:108-148) as a first-class DataSource V2
  * micro-batch streaming source — `format("graft-socket")`.
  *
  * Wire protocol (line-oriented, mirroring the reference client):
  *  1. on connect, send ONE subscribe command line —
  *     `{"id":1,"cmd":"subscribe","params":{"channels":[...],
  *     "market_tickers":[...]}}` (kalshi_ws_client.py:119-127);
  *  2. the server replies with NDJSON wire envelopes, one message per
  *     line (the same envelope schema the file-replay path parses);
  *  3. the client validates the per-connection monotone `seq` on every
  *     book message and FAILS THE QUERY on a gap (`failOnGap=true`,
  *     default) — the reference's fail-stop contract
  *     (kalshi_ws_client.py:129-146: `raise RuntimeError("Missed
  *     message! ...")`). Recovery is a restart + re-snapshot, exactly
  *     like the reference; set `failOnGap=false` to let the downstream
  *     SeqValidator surface gaps as data instead.
  *
  * Scale notes: a socket feed is inherently a single-connection,
  * driver-buffered source (Spark's own socket source has the same
  * shape) — the reference's feed is bounded at ~1k msg/s per stream by
  * its poll cadence, which driver buffering absorbs trivially. At real
  * fan-in you run one such connection per market shard behind a
  * durable log; everything downstream of [[Connectors.MessageSource]]
  * is unchanged. Offsets are monotone line counts, committed batches
  * are trimmed from the buffer, so memory is bounded by
  * (uncommitted backlog), not connection lifetime. Offsets are only
  * meaningful within one connection: restarting a query from an old
  * checkpoint fails fast (see planInputPartitions) rather than
  * misattributing fresh lines to stale offsets.
  */
object WireSocket {
  /** Single-column raw-line schema — identical to the file-replay
    * text source, so [[StreamPipeline.decode]] serves both paths. */
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** The subscribe command line (kalshi_ws_client.py:119-127). */
  def subscribeCommand(tickers: Seq[String],
      channels: Seq[String] = Seq("orderbook_delta")): String = {
    def arr(xs: Seq[String]) = xs.map(x => s""""$x"""").mkString("[", ",", "]")
    s"""{"id":1,"cmd":"subscribe","params":{"channels":${arr(channels)},""" +
      s""""market_tickers":${arr(tickers)}}}"""
  }

  /** The optional auth command line, sent BEFORE subscribe when the
    * source is given credentials. A WebSocket client carries its signed
    * auth as CONNECT headers (kalshi_ws_client.py:106-115); this
    * line-oriented protocol carries the same signed header map as the
    * connection's first line instead. Keys are sorted so the line is
    * byte-deterministic for a given signature. */
  def authCommand(headers: Map[String, String]): String = {
    val fields = headers.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"id":0,"cmd":"auth","params":{"headers":{$fields}}}"""
  }

  /** The WS endpoint path the auth signature covers
    * (kalshi_ws_client.py:110: the client signs GET + the WS path). */
  val AuthPath = "/trade-api/ws/v2"

  /** Minimal JSON string literal (for synthetic envelopes). */
  private[streaming] def jsonString(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private val SeqField = """"seq"\s*:\s*(\d+)""".r.unanchored
  private val BookType = """"type"\s*:\s*"orderbook_(snapshot|delta)"""".r.unanchored

  /** The validator loop body (kalshi_ws_client.py:129-146): book
    * messages must carry seq == expected; returns the next expected.
    * Non-book messages (acks, errors) pass through unvalidated, like
    * the reference's `if msg_type in [...]` guard. */
  private[streaming] def validateSeq(line: String, expected: Long): Long =
    if (BookType.matches(line)) {
      val seq = SeqField.findFirstMatchIn(line)
        .map(_.group(1).toLong)
        .getOrElse(throw new RuntimeException(
          s"Book message without seq: $line"))
      if (seq != expected)
        throw new RuntimeException(
          s"Missed message! Expected seq: $expected, Received seq: $seq")
      expected + 1
    } else expected
}

/** `format("graft-socket")` provider (registered via
  * META-INF/services DataSourceRegister). Options: `host`, `port`,
  * `tickers` (comma-separated), `channels` (comma-separated, default
  * orderbook_delta), `failOnGap` (default true), `maxReconnects`
  * (default 0 = fail-stop parity with the reference; > 0 folds the
  * restart into the stream: re-connect + re-auth + re-subscribe with a
  * synthetic `graft_resubscribed` envelope per recovery, backoff
  * `reconnectBackoffMs`), `maxLinesPerTrigger` (admission control:
  * per-micro-batch line budget across shards — lossless backpressure,
  * see [[WireSocketStream.latestOffset]]; the budget splits evenly and
  * idle shards' unused shares are re-granted to lagging shards, and
  * when the budget is below the shard count the min-1-line-per-shard
  * progress floor may exceed it by up to nShards−1 lines), and for
  * authenticated feeds
  * `accessKey` + `privateKeyFile` (PKCS#8 PEM) with optional
  * `authPath` (default [[WireSocket.AuthPath]]).
  *
  * `transport` selects the wire (default `tcp` — NDJSON over a raw
  * socket, the replay-fixture shape):
  *  - `ws`  — RFC 6455 WebSocket ([[WsWire]]): HTTP Upgrade handshake
  *    on `path` (default [[WireSocket.AuthPath]]), masked client
  *    frames, one text message per envelope, ping/pong + close
  *    handshake + fragmentation handled per the RFC. Signed auth rides
  *    as CONNECT request headers, exactly the reference's shape
  *    (kalshi_ws_client.py:106-115) — NOT as a first line.
  *  - `wss` — `ws` over TLS with hostname verification; trust defaults
  *    to the JDK store, or a private CA via `trustStoreFile` +
  *    `trustStorePass` (PKCS#12).
  * Subscribe command, envelope schema, seq fail-stop, offsets, and the
  * reconnect contract are IDENTICAL across transports — downstream
  * cannot tell them apart.
  *
  * `shards` (optional) = comma-separated `host:port` endpoints: one
  * connection AND one Spark input partition per shard, tickers
  * assigned round-robin, per-shard seq validation + reconnect budget
  * ([[WireSocketStream]]). */
class WireSocketProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-socket"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WireSocket.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WireSocketTable(new CaseInsensitiveStringMap(properties))
}

private[streaming] class WireSocketTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    // shards-only configuration has no host/port options — render the
    // endpoint list instead of "null:null"
    Option(options.get("shards")) match {
      case Some(s) => s"graft-socket(shards=$s)"
      case None =>
        s"graft-socket(${options.get("host")}:${options.get("port")})"
    }
  override def schema(): StructType = WireSocket.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WireSocket.schema
        override def toMicroBatchStream(ckpt: String): MicroBatchStream = {
          // credentials present → signed auth (a header map for the WS
          // CONNECT request, or the first line for the tcp transport);
          // absent → unauthenticated replay, the default. The thunk
          // defers SIGNING to the moment the reader thread actually
          // connects: endpoints in this auth family reject timestamps
          // outside a small skew window, so a signature minted at plan
          // time would go stale during any planning→connect delay.
          val path =
            Option(options.get("authPath")).getOrElse(WireSocket.AuthPath)
          val auth: Option[() => Map[String, String]] = for {
            key <- Option(options.get("accessKey"))
            pem <- Option(options.get("privateKeyFile"))
          } yield {
            val signer = Signing.signerFromKeyFile(pem, key)
            () => signer.headers("GET", path)
          }
          val ssl: Option[javax.net.ssl.SSLContext] =
            Option(options.get("trustStoreFile")).map(f =>
              WsWire.sslContext(f,
                Option(options.get("trustStorePass")).getOrElse("changeit")))
          val tickers = Option(options.get("tickers"))
            .map(_.split(",").toSeq).getOrElse(Seq.empty)
          val channels = Option(options.get("channels"))
            .map(_.split(",").toSeq).getOrElse(Seq("orderbook_delta"))
          // `shards` = comma-separated host:port endpoints, one
          // connection (and one Spark input partition) each; tickers
          // are assigned round-robin across shards. Absent → the
          // single host/port connection.
          val endpoints: Seq[(String, Int)] =
            Option(options.get("shards")) match {
              case Some(s) => s.split(",").toSeq.map { hp =>
                val i = hp.lastIndexOf(':')
                require(i > 0, s"shard '$hp' is not host:port")
                (hp.substring(0, i), hp.substring(i + 1).toInt)
              }
              case None =>
                Seq((options.get("host"), options.get("port").toInt))
            }
          // round-robin over fewer tickers than shards would leave the
          // tail shards subscribing with an EMPTY market_tickers list —
          // on the reference's wire that means "everything", silently
          // duplicating the whole feed into those partitions. Reject at
          // plan time instead of producing duplicate streams.
          // …and an EMPTY tickers option means "the full feed": with
          // N>1 shards every shard would subscribe to everything,
          // duplicating the whole feed N×. Full-feed mode is
          // single-shard only.
          require(tickers.nonEmpty || endpoints.size == 1,
            s"${endpoints.size} shards with no tickers — every shard " +
              "would subscribe to the full feed, duplicating it " +
              s"${endpoints.size}×; full-feed mode needs exactly 1 shard")
          require(tickers.isEmpty || endpoints.size <= tickers.size,
            s"${endpoints.size} shards but only ${tickers.size} tickers — " +
              "a shard with no tickers would subscribe to the full feed; " +
              "use at most one shard per ticker")
          val conns = endpoints.zipWithIndex.map { case ((h, p), i) =>
            val shardTickers =
              if (endpoints.size == 1) tickers
              else tickers.zipWithIndex
                .filter(_._2 % endpoints.size == i).map(_._1)
            new WireConn(h, p, shardTickers, channels,
              options.getBoolean("failOnGap", true), auth,
              options.getInt("maxReconnects", 0),
              options.getLong("reconnectBackoffMs", 200L),
              Option(options.get("transport")).getOrElse("tcp"),
              path, ssl)
          }
          val maxLines = options.getLong("maxLinesPerTrigger", Long.MaxValue)
          require(maxLines > 0, s"maxLinesPerTrigger must be > 0, got $maxLines")
          new WireSocketStream(conns, maxLines)
        }
      }
    }
}

/** Per-shard offsets: one monotone line count per connection, joined
  * with commas (a single shard serializes exactly like the round-9
  * scalar offset). */
private[streaming] case class WireOffset(ns: Seq[Long]) extends Offset {
  override def json(): String = ns.mkString(",")
}
private[streaming] object WireOffset {
  def apply(n: Long): WireOffset = WireOffset(Seq(n))
  def parse(json: String): WireOffset =
    WireOffset(json.split(",").toSeq.map(_.trim.toLong))
}

/** ONE wire connection: socket + line buffer + reader thread + the
  * reconnect loop — the unit a shard owns. All of round 9's contract
  * lives here unchanged (subscribe-on-connect, per-connection seq
  * fail-stop, `graft_resubscribed` recovery epochs, line-count
  * offsets); [[WireSocketStream]] composes N of these into an
  * N-partition source. `transport` picks the wire (`tcp` NDJSON /
  * `ws` RFC 6455 / `wss` = ws over TLS); the contract is
  * transport-independent. */
private[streaming] final class WireConn(host: String, port: Int,
    tickers: Seq[String], channels: Seq[String], failOnGap: Boolean,
    auth: Option[() => Map[String, String]] = None,
    maxReconnects: Int = 0, reconnectBackoffMs: Long = 200L,
    transport: String = "tcp", wsPath: String = WireSocket.AuthPath,
    ssl: Option[javax.net.ssl.SSLContext] = None) {

  require(Set("tcp", "ws", "wss")(transport),
    s"unknown transport '$transport' (tcp | ws | wss)")

  private val lock = new Object
  // lines received but not yet committed; head is offset `committed`
  private val buf = ArrayBuffer.empty[String]
  private var committed = 0L
  @volatile private var readerError: Throwable = _
  @volatile private var socket: Socket = _
  @volatile private var stopped = false

  /** One connection epoch: auth + subscribe, then read lines until the
    * server closes or a seq gap fail-stops it. Per-connection state
    * (the monotone `seq`) resets with the connection, exactly like the
    * reference client's restart. */
  private def runEpoch(): Unit =
    if (transport == "tcp") runEpochTcp() else runEpochWs()

  /** Legacy line wire: signed auth as the first line (the tcp protocol
    * has no headers to carry it), then NDJSON envelopes. */
  private def runEpochTcp(): Unit = {
    socket = new Socket(host, port)
    val out = new OutputStreamWriter(socket.getOutputStream,
      StandardCharsets.UTF_8)
    auth.foreach(a => // signed at connect
      out.write(WireSocket.authCommand(a()) + "\n"))
    out.write(WireSocket.subscribeCommand(tickers, channels) + "\n")
    out.flush()
    val in = new BufferedReader(new InputStreamReader(
      socket.getInputStream, StandardCharsets.UTF_8))
    var expected = 1L
    var line = in.readLine()
    while (line != null) {
      if (failOnGap) expected = WireSocket.validateSeq(line, expected)
      lock.synchronized { buf += line }
      line = in.readLine()
    } // null = server closed: end of this connection epoch
  }

  /** RFC 6455 wire (the reference's actual transport,
    * kalshi_ws_client.py:111-115): Upgrade handshake with the signed
    * headers ON the CONNECT request, subscribe as the first text
    * frame, one envelope per text message; a server close frame ends
    * the epoch exactly like tcp EOF. */
  private def runEpochWs(): Unit = {
    socket = transport match {
      case "wss" =>
        val ctx = ssl.getOrElse(javax.net.ssl.SSLContext.getDefault)
        WsWire.tlsSocket(ctx, host, port)
      case _ => new Socket(host, port)
    }
    val ws = new WsWire.Client(socket, s"$host:$port", wsPath,
      auth.map(_()).getOrElse(Map.empty))
    ws.handshake()
    ws.sendText(WireSocket.subscribeCommand(tickers, channels))
    var expected = 1L
    var msg = ws.receiveText()
    while (msg.isDefined) {
      val line = msg.get
      if (failOnGap) expected = WireSocket.validateSeq(line, expected)
      lock.synchronized { buf += line }
      msg = ws.receiveText()
    } // None = close handshake done: end of this connection epoch
  }

  /** RECOVERY = re-subscribe + re-snapshot (the reference fail-stops
    * and restarts the process, kalshi_ws_client.py:141-146; with
    * `maxReconnects > 0` this source folds that restart INTO the
    * stream). Each recovered epoch emits a synthetic
    * `graft_resubscribed` envelope first, so the drop is auditable
    * downstream (the router's dead-letter lane keeps it queryable) and
    * book consumers know a fresh snapshot supersedes pre-gap deltas —
    * which the subscribe handshake delivers anyway, making the book
    * state self-healing. Offsets stay line counts over the CONCATENATED
    * epochs: already-buffered lines are never renumbered, so committed
    * batches are unaffected by later reconnects. */
  private val reader = new Thread(s"graft-socket-$host:$port") {
    override def run(): Unit = {
      var attempts = 0
      var done = false
      while (!done && !stopped) {
        // a clean server close is "end of feed" for replay fixtures
        // (maxReconnects = 0, the default) but a DISCONNECTION for a
        // live feed — with reconnection enabled it re-subscribes too
        val cause: Option[Throwable] =
          try { runEpoch(); None }
          catch { case e: Throwable => Some(e) }
        if (stopped || (cause.isEmpty && maxReconnects == 0)) done = true
        else {
          attempts += 1
          if (attempts > maxReconnects) {
            cause.foreach(readerError = _)
            done = true
          } else {
            val why = cause.map(_.getMessage).getOrElse("server closed")
            lock.synchronized {
              buf += s"""{"type":"graft_resubscribed","attempt":$attempts,""" +
                s""""cause":${WireSocket.jsonString(why)}}"""
            }
            try { if (socket != null) socket.close() } catch { case _: Throwable => () }
            Thread.sleep(reconnectBackoffMs)
          }
        }
      }
    }
  }
  reader.setDaemon(true)
  reader.start()

  def raiseIfFailed(): Unit = {
    val e = readerError
    if (e != null) throw new RuntimeException(
      s"graft-socket reader failed ($host:$port): ${e.getMessage}", e)
  }

  def latest: Long = lock.synchronized(committed + buf.size)

  def slice(s: Long, e: Long): Array[String] = lock.synchronized {
    // fail fast instead of serving wrong lines: offsets index THIS
    // connection's line stream, so a range outside the live buffer
    // means Spark is replaying a checkpoint from a previous run — a
    // socket feed is not a durable log and cannot honor it (Spark's
    // own socket source documents the same non-recoverability).
    if (s < committed || e > committed + buf.size)
      throw new IllegalStateException(
        s"graft-socket ($host:$port) cannot serve offsets [$s, $e): the " +
          s"live buffer covers [$committed, ${committed + buf.size}). " +
          "Checkpointed offsets from a previous run are unrecoverable " +
          "over a raw socket feed — restart with a fresh checkpoint " +
          "(recovery = re-subscribe + re-snapshot, like the reference " +
          "client), or front the feed with a durable log.")
    buf.slice((s - committed).toInt, (e - committed).toInt).toArray
  }

  def commitUpTo(upTo: Long): Unit = lock.synchronized {
    val drop = (upTo - committed).toInt
    if (drop > 0) { buf.remove(0, drop); committed = upTo }
  }

  def stop(): Unit = {
    stopped = true
    val s = socket
    if (s != null && !s.isClosed) s.close()
  }
}

/** N-shard micro-batch source: one [[WireConn]] per subscription shard,
  * one input partition per shard per batch — ingest parallelism is the
  * shard count, not 1 (the round-9 single-connection shape is the
  * 1-shard case and serializes identical offsets). Each shard keeps
  * its OWN per-connection seq validation and reconnect budget: a gap
  * on one shard fail-stops the query (the reference contract), and a
  * recovered shard re-subscribes only its own ticker subset. At real
  * fan-in this is the "one connection per market shard" deployment the
  * round-9 scale note described — now executable instead of a comment. */
private[streaming] class WireSocketStream(conns: Seq[WireConn],
    maxLines: Long = Long.MaxValue)
    extends MicroBatchStream with SupportsAdmissionControl {
  require(conns.nonEmpty, "graft-socket needs at least one shard")

  override def initialOffset(): Offset =
    WireOffset(Seq.fill(conns.size)(0L))

  override def deserializeOffset(json: String): Offset = {
    val o = WireOffset.parse(json)
    require(o.ns.size == conns.size,
      s"offset has ${o.ns.size} shards, source has ${conns.size} — a " +
        "checkpoint from a different shard layout is unrecoverable")
    o
  }

  /** BACKPRESSURE (`maxLinesPerTrigger`): bound each micro-batch at the
    * OFFSET level — the unserved remainder stays buffered in the
    * [[WireConn]]s and feeds the next batch, so throttling is lossless
    * by construction (nothing is ever dropped, only deferred). The
    * guard exists for the composed deployable ([[graft.Ingest]]): its
    * producer stage collects each batch on the driver before the
    * durable-queue append, so an unthrottled burst while the consumer
    * lags would grow that collect without bound. The budget splits
    * evenly across shards (min 1 line/shard so a skewed shard can
    * always make progress). */
  override def getDefaultReadLimit: ReadLimit =
    if (maxLines == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxLines)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    conns.foreach(_.raiseIfFailed())
    val cap: Long = limit match {
      case mr: ReadMaxRows => math.min(maxLines, mr.maxRows())
      case _ => maxLines
    }
    if (cap == Long.MaxValue) WireOffset(conns.map(_.latest))
    else {
      val s = start.asInstanceOf[WireOffset].ns
      // Saturating add: a huge-but-finite cap (e.g. Long.MaxValue-1
      // passes the >0 require) must clamp, never wrap negative — a
      // wrapped end < start would corrupt planInputPartitions.
      def satAdd(a: Long, b: Long): Long =
        if (b > Long.MaxValue - a) Long.MaxValue else a + b
      val latest = conns.map(_.latest)
      val per = math.max(1L, cap / conns.size)
      val ends = conns.indices.map(i =>
        math.min(latest(i), satAdd(s(i), per))).toArray
      // Grant the unused remainder of the budget (idle shards' shares)
      // to shards still behind, in shard order: a hot shard drains at
      // the full cap when its siblings are quiet, instead of being
      // pinned to cap/nShards per batch. When cap < nShards the min-1
      // floor may exceed the cap by up to nShards-1 lines (progress
      // beats precision — documented on the option), in which case
      // leftover is non-positive and no grants happen.
      var leftover = cap - conns.indices.map(i => ends(i) - s(i)).sum
      var i = 0
      while (leftover > 0 && i < ends.length) {
        val grant = math.min(leftover, latest(i) - ends(i))
        if (grant > 0) { ends(i) = satAdd(ends(i), grant); leftover -= grant }
        i += 1
      }
      WireOffset(ends.toIndexedSeq)
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-socket uses SupportsAdmissionControl.latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    conns.foreach(_.raiseIfFailed())
    val s = start.asInstanceOf[WireOffset].ns
    val e = end.asInstanceOf[WireOffset].ns
    conns.indices.map { i =>
      WireLinesPartition(conns(i).slice(s(i), e(i)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WireLinesReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[WireOffset].ns
    conns.indices.foreach(i => conns(i).commitUpTo(e(i)))
  }

  override def stop(): Unit = conns.foreach(_.stop())
}

private[streaming] case class WireLinesPartition(lines: Array[String])
    extends InputPartition

private[streaming] object WireLinesReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val lines = partition.asInstanceOf[WireLinesPartition].lines
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(lines(i)))
      override def close(): Unit = ()
    }
  }
}
