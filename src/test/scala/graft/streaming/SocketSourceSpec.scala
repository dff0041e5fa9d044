package graft.streaming

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.Fixtures

/** A2 live-path e2e: the graft-socket DSv2 source against a local
  * replay server speaking the reference's wire protocol — subscribe
  * command in (kalshi_ws_client.py:119-127), NDJSON envelopes out,
  * fail-stop on a seq gap (kalshi_ws_client.py:129-146). */
class SocketSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  /** One-connection replay server: accepts, records the subscribe
    * line, writes `lines`, then half-closes output (EOF = end of
    * feed). */
  private final class ReplayServer(lines: Seq[String]) {
    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    @volatile var subscribeLine: String = _
    private val t = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedReader(new InputStreamReader(
        sock.getInputStream, StandardCharsets.UTF_8))
      subscribeLine = in.readLine()
      val out = new OutputStreamWriter(sock.getOutputStream,
        StandardCharsets.UTF_8)
      lines.foreach(l => out.write(l + "\n"))
      out.flush()
      sock.shutdownOutput()
    })
    t.setDaemon(true)
    t.start()
    def close(): Unit = server.close()
  }

  // single ticker → per-connection-global seq 1..20, like the live feed
  private def feedLines: Seq[String] =
    Fixtures.genMessages(Seq("KXTEST-A"), 20).map(Fixtures.envelopeJson)

  private def opts(kv: (String, String)*) =
    new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(kv.toMap).asJava)

  test("shards-only table renders the endpoint list in name(), not " +
    "null:null") {
    val t = new WireSocketTable(opts("shards" -> "h1:1,h2:2"))
    assert(t.name() === "graft-socket(shards=h1:1,h2:2)")
    assert(new WireSocketTable(opts("host" -> "h", "port" -> "9"))
      .name() === "graft-socket(h:9)")
  }

  test("more shards than tickers is rejected at plan time — a " +
    "ticker-less shard would subscribe to the whole feed") {
    val m = opts("shards" -> "h1:1,h2:2,h3:3", "tickers" -> "T1,T2")
    val e = intercept[IllegalArgumentException] {
      new WireSocketTable(m).newScanBuilder(m).build()
        .toMicroBatchStream("/tmp/unused")
    }
    assert(e.getMessage.contains("shards"))
  }

  private def awaitRows(queryName: String, want: Long,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var n = -1L
    while (n != want && System.nanoTime() < deadline) {
      q.processAllAvailable()
      n = spark.table(queryName).count()
      if (n != want) Thread.sleep(100)
    }
    assert(n === want, s"timed out: $queryName has $n rows, want $want")
  }

  test("subscribe handshake carries the channel and ticker list") {
    val server = new ReplayServer(feedLines)
    try {
      val src = new Connectors.SocketMessageSource(
        "localhost", server.port, Seq("KXTEST-A", "KXTEST-B"))
      val q = src.messages(spark).writeStream
        .format("memory").queryName("ws_handshake").outputMode("append")
        .start()
      try awaitRows("ws_handshake", feedLines.size.toLong, q)
      finally q.stop()
      assert(server.subscribeLine ===
        """{"id":1,"cmd":"subscribe","params":{"channels":["orderbook_delta"],""" +
          """"market_tickers":["KXTEST-A","KXTEST-B"]}}""")
    } finally server.close()
  }

  test("socket feed is schema-identical to file replay downstream") {
    val server = new ReplayServer(feedLines)
    try {
      val src = new Connectors.SocketMessageSource(
        "localhost", server.port, Seq("KXTEST-A"))
      val msgs = src.messages(spark)
      val q = StreamPipeline.routeDeltas(msgs).writeStream
        .format("memory").queryName("ws_deltas").outputMode("append")
        .start()
      val wantDeltas = Fixtures.genMessages(Seq("KXTEST-A"), 20)
        .collect { case Right(d) => d }
      try awaitRows("ws_deltas", wantDeltas.size.toLong, q)
      finally q.stop()
      val got = spark.table("ws_deltas")
      assert(got.agg(sum("delta")).head.getLong(0) ===
        wantDeltas.map(_.delta.toLong).sum)
      assert(got.columns.toSet ===
        StreamPipeline.routeDeltas(StreamPipeline.parseMessages(
          spark, feedLines)).columns.toSet)
    } finally server.close()
  }

  test("a seq gap fail-stops the query (reference contract)") {
    val gappy = Fixtures.genMessages(Seq("KXTEST-A"), 20)
      .filterNot {
        case Left(s) => s.seq == 5L
        case Right(d) => d.seq == 5L
      }.map(Fixtures.envelopeJson)
    val server = new ReplayServer(gappy)
    val ckpt = Files.createTempDirectory("ws-gap-ckpt")
    try {
      val src = new Connectors.SocketMessageSource(
        "localhost", server.port, Seq("KXTEST-A"))
      val q = src.messages(spark).writeStream
        .format("memory").queryName("ws_gap").outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .start()
      val e = intercept[StreamingQueryException] {
        q.awaitTermination(30000)
        // if the gap didn't kill it within 30 s, fail loudly
        throw new AssertionError(s"query still running: ${q.status}")
      }
      assert(e.getMessage.contains("Missed message!") &&
        e.getMessage.contains("Expected seq: 5"), e.getMessage)
    } finally { server.close(); ckpt.toFile.delete() }
  }

  /** Serves one scripted line-list per accepted connection, in order —
    * the far end of the reconnect path. */
  private final class EpochServer(epochs: Seq[Seq[String]]) {
    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    @volatile var connections = 0
    private val t = new Thread(() => {
      epochs.foreach { lines =>
        val sock = server.accept()
        connections += 1
        val in = new BufferedReader(new InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        in.readLine() // subscribe
        val out = new OutputStreamWriter(sock.getOutputStream,
          StandardCharsets.UTF_8)
        lines.foreach(l => out.write(l + "\n"))
        out.flush()
        sock.shutdownOutput()
      }
    })
    t.setDaemon(true)
    t.start()
    def close(): Unit = server.close()
  }

  test("maxReconnects folds the reference's restart into the stream: " +
    "gap -> resubscribe marker -> fresh snapshot epoch") {
    // epoch 1 fail-stops at seq 5 (gap); epoch 2 is the re-subscribe
    // answer: a fresh snapshot-led feed with per-connection seq from 1
    val gappy = Fixtures.genMessages(Seq("KXTEST-A"), 8)
      .filterNot {
        case Left(s) => s.seq == 5L
        case Right(d) => d.seq == 5L
      }.map(Fixtures.envelopeJson)
    val fresh = Fixtures.genMessages(Seq("KXTEST-A"), 6)
      .map(Fixtures.envelopeJson)
    val server = new EpochServer(Seq(gappy, fresh))
    val ckpt = Files.createTempDirectory("ws-reconnect-ckpt")
    try {
      val q = spark.readStream.format("graft-socket")
        .option("host", "localhost").option("port", server.port)
        .option("tickers", "KXTEST-A")
        .option("channels", "orderbook_snapshot,orderbook_delta")
        // 1, not 2: the budget covers the gap recovery, and epoch 2's
        // clean close then ENDS the feed (attempts exhausted, no error)
        // instead of retrying against a server with no script left
        .option("maxReconnects", 1)
        .load()
        .writeStream.format("memory").queryName("ws_reconnect")
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .start()
      // 4 pre-gap lines survive from epoch 1, then the marker, then
      // all 6 of epoch 2 — the gap itself is dropped, not served
      awaitRows("ws_reconnect", 4 + 1 + 6, q)
      val lines = spark.table("ws_reconnect")
        .select("value").collect().map(_.getString(0)).toSeq
      assert(server.connections === 2, "no second subscribe happened")
      val marker = lines.filter(_.contains("graft_resubscribed"))
      assert(marker.size === 1 && marker.head.contains("Missed message!"),
        s"missing/wrong resubscribe marker: $marker")
      // the recovered epoch leads with its own snapshot (seq 1)
      val afterMarker = lines.drop(lines.indexWhere(
        _.contains("graft_resubscribed")) + 1)
      assert(afterMarker.size === 6)
      assert(afterMarker.head.contains(""""seq":1"""),
        s"recovered epoch did not lead with a fresh snapshot: " +
          s"${afterMarker.head}")
      q.stop()
    } finally { server.close(); ckpt.toFile.delete() }
  }

  test("validateSeq mirrors the reference loop exactly") {
    val snap = """{"type":"orderbook_snapshot","seq":1,"msg":{}}"""
    val delta = """{"type":"orderbook_delta","seq":2,"msg":{}}"""
    val ack = """{"id":1,"type":"subscribed"}"""
    // book messages advance; non-book messages pass through
    assert(WireSocket.validateSeq(snap, 1L) === 2L)
    assert(WireSocket.validateSeq(ack, 2L) === 2L)
    assert(WireSocket.validateSeq(delta, 2L) === 3L)
    val e = intercept[RuntimeException] {
      WireSocket.validateSeq(
        """{"type":"orderbook_delta","seq":7,"msg":{}}""", 3L)
    }
    assert(e.getMessage === "Missed message! Expected seq: 3, Received seq: 7")
  }
}
