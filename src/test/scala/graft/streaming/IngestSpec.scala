package graft.streaming

import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite

import graft.{Ingest, TestSpark}
import graft.orderbook.Fixtures

/** End-to-end gate for the deployable composed pipeline
  * (`graft.Ingest`, the reference's `__main__.py:7-13` shape): real RFC
  * 6455 frames from a WsReplay server → producer (graft-socket →
  * graft-queue) ∥ consumer (graft-queue → normalize → exactly-once
  * JDBC into embedded Derby), running concurrently on one session —
  * then a producer-replay and a malformed line pushed through the live
  * consumer to pin the dedup and dead-letter branches. */
class IngestSpec extends AnyFunSuite {
  private val spark = TestSpark.init()

  private def derby(): (String, Map[String, String]) = {
    val dir = Files.createTempDirectory("graft-ingest-derby")
    dir.toFile.deleteOnExit()
    (s"jdbc:derby:${dir.resolve("db")};create=true",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
  }

  private def sql(url: String, props: Map[String, String], q: String): Long = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    Option(p.getProperty("driver")).foreach(Class.forName)
    val conn = DriverManager.getConnection(url, p)
    try {
      val rs = conn.createStatement().executeQuery(q)
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("producer ∥ consumer end-to-end: socket → queue → Derby, " +
      "exactly-once under replay, dead letters queryable") {
    val tickers = (0 until 4).map(i => f"KXE2E-$i%02d")
    val msgs = Fixtures.genMessages(tickers, 50)
    // one connection ⇒ one monotone seq (kalshi_ws_client.py:129-146);
    // the generator numbers per ticker, so renumber globally and pin
    // one sid for the session
    val lines = msgs.map(Fixtures.envelopeJson).zipWithIndex.map {
      case (l, i) => l.replaceFirst("\"sid\":\\d+", "\"sid\":7000")
        .replaceFirst("\"seq\":\\d+", s""""seq":${i + 1}""")
    }
    val wantDeltas = msgs.count(_.isRight).toLong
    val wantSnapRows = msgs.collect { case Left(s) =>
      s.yes.size + s.no.size }.sum.toLong

    val server = WsReplay.server(lines)
    val (url, jprops) = derby()
    val queue = Files.createTempDirectory("graft-ingest-queue")
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt")
    val dead = Files.createTempDirectory("graft-ingest-dead")
    val cfg = Ingest.Config(
      role = "both",
      queueDir = queue.toString,
      checkpointDir = ckpt.toString,
      jdbcUrl = url,
      jdbcProps = jprops,
      deadLetterDir = Some(dead.resolve("letters").toString),
      socketOptions = Map(
        "host" -> "localhost", "port" -> server.getLocalPort.toString,
        "tickers" -> tickers.mkString(","),
        "channels" -> "orderbook_snapshot,orderbook_delta",
        "transport" -> "ws"))
    val queries = Ingest.run(spark, cfg)
    try {
      val consumer = queries.last
      def deltaCount() = try sql(url, jprops,
        "SELECT COUNT(*) FROM orderbook_deltas") catch {
        case _: Throwable => -1L
      }
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (deltaCount() < wantDeltas && System.nanoTime() < deadline) {
        queries.foreach(_.processAllAvailable())
        if (deltaCount() < wantDeltas) Thread.sleep(50)
      }
      assert(deltaCount() === wantDeltas)
      assert(sql(url, jprops,
        "SELECT COUNT(*) FROM orderbook_snapshots") === wantSnapRows)

      // producer replay (the reference's XADD-after-crash window): the
      // same raw lines land in NEW segments; the watermark-bounded
      // lineage dedup must drop every one before the sink
      QueueLog.append(queue.toString, lines)
      consumer.processAllAvailable()
      assert(deltaCount() === wantDeltas)
      assert(sql(url, jprops,
        "SELECT COUNT(*) FROM orderbook_snapshots") === wantSnapRows)
      // and the facts are lineage-distinct (no silent double-append)
      assert(sql(url, jprops,
        """SELECT COUNT(DISTINCT "redis_stream_id") FROM orderbook_deltas""")
        === wantDeltas)

      // a malformed line routes to the dead-letter lane, not a crash
      QueueLog.append(queue.toString, Seq("""{"garbage": tru"""))
      consumer.processAllAvailable()
      val letters = spark.read.parquet(dead.resolve("letters").toString)
      assert(letters.count() === 1L)
      assert(letters.select("raw").head.getString(0).contains("garbage"))

      // retention (the XDEL twin): consumed segments below the last
      // committed offset are trimmed — one more batch so the commit
      // covers the tail, then the queue dir must be near-empty while
      // every count above stays exact
      QueueLog.append(queue.toString, Seq("""{"garbage": als"""))
      consumer.processAllAvailable()
      assert(QueueLog.segments(queue.toString).size <= 3,
        s"queue retention never trimmed: ${QueueLog.segments(queue.toString)}")
      assert(deltaCount() === wantDeltas)
    } finally {
      queries.foreach(_.stop())
      server.close()
    }
  }

  /** The producer's driver-side collect is bounded ONLY by admission
    * control: with `maxLinesPerTrigger` set, every micro-batch (and
    * therefore every collect + queue segment) obeys the budget, and
    * the unserved remainder is deferred — never dropped. This pins
    * both halves: bounded batches AND lossless drain. */
  test("throttled producer (maxLinesPerTrigger) drains losslessly in " +
      "bounded batches") {
    val tickers = Seq("KXBP-00", "KXBP-01")
    val msgs = Fixtures.genMessages(tickers, 120)
    val lines = msgs.map(Fixtures.envelopeJson).zipWithIndex.map {
      case (l, i) => l.replaceFirst("\"sid\":\\d+", "\"sid\":7100")
        .replaceFirst("\"seq\":\\d+", s""""seq":${i + 1}""")
    }
    val server = WsReplay.server(lines)
    val queue = Files.createTempDirectory("graft-bp-queue")
    val ckpt = Files.createTempDirectory("graft-bp-ckpt")
    val cfg = Ingest.Config(
      role = "producer",
      queueDir = queue.toString,
      checkpointDir = ckpt.toString,
      jdbcUrl = "",
      socketOptions = Map(
        "host" -> "localhost", "port" -> server.getLocalPort.toString,
        "tickers" -> tickers.mkString(","),
        "channels" -> "orderbook_snapshot,orderbook_delta",
        "transport" -> "ws",
        "maxLinesPerTrigger" -> "25"))
    val queries = Ingest.run(spark, cfg)
    try {
      def queued(): Seq[String] = QueueLog.segments(queue.toString)
        .flatMap { case (_, p) =>
          scala.jdk.CollectionConverters
            .CollectionHasAsScala(Files.readAllLines(p)).asScala
        }
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (queued().size < lines.size && System.nanoTime() < deadline) {
        queries.foreach(_.processAllAvailable())
        if (queued().size < lines.size) Thread.sleep(50)
      }
      // lossless: every line arrives, in order, exactly once
      assert(queued() === lines)
      // bounded: each micro-batch appended one segment of ≤ the budget,
      // so the drain took ≥ ⌈n/25⌉ segments and no segment exceeds 25
      val segSizes = QueueLog.segments(queue.toString).map { case (_, p) =>
        Files.readAllLines(p).size
      }
      assert(segSizes.forall(_ <= 25),
        s"a micro-batch exceeded the 25-line budget: $segSizes")
      assert(segSizes.size >= (lines.size + 24) / 25,
        s"drain took too few batches to have been throttled: $segSizes")
    } finally {
      queries.foreach(_.stop())
      server.close()
    }
  }

  test("parseArgs: flags, socket options, auth pairing, unknowns") {
    val cfg = Ingest.parseArgs(Array(
      "--queue", "/q", "--checkpoint", "/c", "--jdbc-url", "jdbc:x",
      "--host", "h", "--port", "9", "--tickers", "A,B",
      "--channels", "orderbook_delta", "--max-reconnects", "2",
      "--access-key", "K", "--private-key-file", "/k.pem", "--drain"))
    assert(cfg.drain)
    assert(cfg.socketOptions === Map("host" -> "h", "port" -> "9",
      "tickers" -> "A,B", "channels" -> "orderbook_delta",
      "maxReconnects" -> "2", "accessKey" -> "K",
      "privateKeyFile" -> "/k.pem"))
    intercept[IllegalArgumentException] {
      Ingest.parseArgs(Array("--queue", "/q", "--bogus", "x"))
    }
    intercept[IllegalArgumentException] { // jdbc-url required for consumer
      Ingest.parseArgs(Array("--queue", "/q", "--checkpoint", "/c"))
    }
    // a pure producer needs no JDBC config
    val prod = Ingest.parseArgs(Array("--role", "producer", "--queue",
      "/q", "--checkpoint", "/c", "--tickers", "A"))
    assert(prod.role === "producer" && prod.jdbcUrl === "")
    // a flag missing its value must NOT swallow the next flag token as
    // its value (credential misconfiguration with no error)
    val missing = intercept[IllegalArgumentException] {
      Ingest.parseArgs(Array("--queue", "/q", "--jdbc-url", "jdbc:x",
        "--jdbc-user", "--jdbc-pass", "secret", "x"))
    }
    assert(missing.getMessage.contains("--jdbc-user"))
    // a trailing unpaired token is loud, not silently dropped
    val unpaired = intercept[IllegalArgumentException] {
      Ingest.parseArgs(Array("--queue", "/q", "--checkpoint"))
    }
    assert(unpaired.getMessage.contains("unpaired"))
  }

  test("resolveTickers: static subscription wins; no config is loud") {
    val static = Ingest.Config(socketOptions = Map("tickers" -> "A,B"))
    assert(Ingest.resolveTickers(static) eq static)
    val e = intercept[IllegalArgumentException] {
      Ingest.resolveTickers(Ingest.Config())
    }
    assert(e.getMessage.contains("--tickers"))
  }
}
