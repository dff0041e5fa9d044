package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.orderbook.Fixtures
import graft.streaming.StreamPipeline

/** Ingest-throughput benchmark: N wire messages replayed through the
  * FULL streaming pipeline (parse → route → explode/flatten → dedup →
  * parquet with checkpointing) — the apples-to-apples comparison with
  * the reference's drain ceiling of ≈1,000 msg/s per stream
  * (batch=100 per XRANGE, 0.1 s idle poll — BASELINE.md).
  *
  * `sbt "runMain graft.StreamBench [nMessages]"` → one JSON line.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(240000)
    val tickers = (0 until 100).map(i => f"KXBENCH-$i%03d")
    val lines = Fixtures.genMessages(tickers, n / tickers.size)
      .map(Fixtures.envelopeJson)

    val in = Files.createTempDirectory("graft-sbench-in")
    val out = Files.createTempDirectory("graft-sbench-out")
    // 24 files → several micro-batches at maxFilesPerTrigger's default
    val per = math.max(1, lines.size / 24)
    lines.grouped(per).zipWithIndex.foreach { case (g, i) =>
      Files.write(in.resolve(f"part-$i%03d.ndjson"), g.asJava)
    }

    val spark = GraftSession.local()
    // warm codegen/IO so the timed run measures steady-state throughput
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val t0 = System.nanoTime()
    StreamPipeline.runUnified(spark, in.toString, out.toString)
      .awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9

    val snapRows = spark.read.parquet(s"$out/orderbook_snapshots").count()
    val deltaRows = spark.read.parquet(s"$out/orderbook_deltas").count()
    val msgs = lines.size
    println(f"""{"metric":"stream_ingest","messages":$msgs,"sec":$sec%.2f,"msgs_per_sec":${msgs / sec}%.0f,"snapshot_rows":$snapRows,"delta_rows":$deltaRows}""")

    // Same pipeline fed from the durable graft-queue source (segment
    // log on disk, executor-side reads) — the buffered-deployment
    // number next to the file-replay one.
    val qdir = Files.createTempDirectory("graft-sbench-queue")
    val qout = Files.createTempDirectory("graft-sbench-qout")
    lines.grouped(per).foreach(g =>
      graft.streaming.QueueLog.append(qdir.toString, g))
    val t1 = System.nanoTime()
    StreamPipeline.runUnifiedFrom(
        new graft.streaming.Connectors.QueueMessageSource(qdir.toString)
          .messages(spark), qout.toString)
      .awaitTermination()
    val qsec = (System.nanoTime() - t1) / 1e9
    val qRows = spark.read.parquet(s"$qout/orderbook_deltas").count()
    println(f"""{"metric":"queue_ingest","messages":$msgs,"sec":$qsec%.2f,"msgs_per_sec":${msgs / qsec}%.0f,"delta_rows":$qRows}""")

    // Stateful-analytics throughput: the same replay driven through
    // the watermarked OHLC candle aggregate (windowed state) — the
    // analytic the reference computes nightly in Polars, here live.
    val cout = Files.createTempDirectory("graft-sbench-candles")
    val t2 = System.nanoTime()
    val cq = StreamPipeline.candles(
        StreamPipeline.readMessages(spark, in.toString))
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$cout/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    cq.awaitTermination()
    val csec = (System.nanoTime() - t2) / 1e9
    println(f"""{"metric":"candle_agg","messages":$msgs,"sec":$csec%.2f,"msgs_per_sec":${msgs / csec}%.0f}""")

    wireIngest(spark, shards = 1)
    wireIngest(spark, shards = 2)
    bookLatency(spark)
    ingestE2e(spark)
    spark.stop()
  }

  /** The DEPLOYABLE end-to-end: [[graft.Ingest]]'s producer ∥ consumer
    * (live WS frames → durable queue → normalize → exactly-once JDBC
    * into embedded Derby) measured as messages / (start → all fact
    * rows durably committed). This is the number a user of the
    * reference's `__main__.py` gets from the whole composed pipeline —
    * including the relational sink the other metrics stop short of;
    * the reference's equivalent ceiling is ≈1k msg/s per stream. */
  private def ingestE2e(spark: org.apache.spark.sql.SparkSession,
      nTickers: Int = 50, perTicker: Int = 1000): Unit = {
    val tickers = (0 until nTickers).map(i => f"KXE2E-$i%02d")
    val msgs = Fixtures.genMessages(tickers, perTicker)
    val lines = msgs.map(Fixtures.envelopeJson).zipWithIndex.map {
      case (l, i) => l.replaceFirst("\"sid\":\\d+", "\"sid\":7100")
        .replaceFirst("\"seq\":\\d+", s""""seq":${i + 1}""")
    }
    val wantDeltas = msgs.count(_.isRight).toLong
    val server = graft.streaming.WsReplay.server(lines)
    val derby = Files.createTempDirectory("graft-e2e-derby")
    val cfg = graft.Ingest.Config(
      role = "both",
      queueDir = Files.createTempDirectory("graft-e2e-q").toString,
      checkpointDir = Files.createTempDirectory("graft-e2e-ck").toString,
      jdbcUrl = s"jdbc:derby:${derby.resolve("db")};create=true",
      jdbcProps = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"),
      socketOptions = Map(
        "host" -> "localhost", "port" -> server.getLocalPort.toString,
        "tickers" -> tickers.mkString(","),
        "channels" -> "orderbook_snapshot,orderbook_delta",
        "transport" -> "ws",
        // the production guard ON for the measured number: bounds the
        // producer's driver-side collect at 10k lines/micro-batch
        // (lossless — the remainder defers to the next batch)
        "maxLinesPerTrigger" -> "10000"))
    def deltaCount(): Long = {
      val p = new java.util.Properties()
      cfg.jdbcProps.foreach { case (k, v) => p.setProperty(k, v) }
      try {
        val c = java.sql.DriverManager.getConnection(cfg.jdbcUrl, p)
        try {
          val rs = c.createStatement()
            .executeQuery("SELECT COUNT(*) FROM orderbook_deltas")
          rs.next(); rs.getLong(1)
        } finally c.close()
      } catch { case _: Throwable => -1L }
    }
    val t0 = System.nanoTime()
    val queries = graft.Ingest.run(spark, cfg)
    try {
      val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
      var n = -1L
      while (n < wantDeltas && System.nanoTime() < deadline) {
        queries.foreach(_.processAllAvailable())
        n = deltaCount()
        if (n < wantDeltas) Thread.sleep(50)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      require(n >= wantDeltas, s"ingest e2e timed out: $n/$wantDeltas")
      println(f"""{"metric":"ingest_e2e","messages":${lines.size},"sec":$sec%.2f,"msgs_per_sec":${lines.size / sec}%.0f,"delta_rows":$n,"max_lines_per_trigger":10000}""")
    } finally {
      queries.foreach(_.stop())
      server.close()
    }
  }

  /** Live-wire ingest: the SAME unified pipeline fed from the
    * graft-socket WS transport — real RFC 6455 frames end-to-end —
    * with `shards` connections (one input partition each). Each shard
    * serves its own ticker set with its own per-connection seq, so the
    * fail-stop validator runs hot on every line; throughput is
    * messages / (start → all rows durably in parquet). The 1-shard vs
    * 2-shard pair is the ingest-parallelism number the sharded source
    * exists for. */
  private def wireIngest(spark: org.apache.spark.sql.SparkSession,
      shards: Int, perShardTickers: Int = 10,
      perTicker: Int = 2000): Unit = {
    val shardTickers = (0 until shards).map(sh =>
      (0 until perShardTickers).map(i => f"KXWIRE$sh%d-$i%02d"))
    // the live validator expects ONE monotone per-CONNECTION seq
    // (kalshi_ws_client.py:129-146); the fixture generator numbers per
    // ticker, so renumber each shard's feed globally 1..m — and give
    // each shard its own sid, or the "sid-seq" lineage ids collide
    // across shards and the replay-dedup silently halves the stream
    val shardLines = shardTickers.zipWithIndex.map { case (ts, sh) =>
      Fixtures.genMessages(ts, perTicker).map(Fixtures.envelopeJson)
        .zipWithIndex.map { case (l, i) =>
          l.replaceFirst("\"sid\":\\d+", s""""sid":${9000 + sh}""")
            .replaceFirst("\"seq\":\\d+", s""""seq":${i + 1}""") } }
    val wantDeltas = shardTickers.zip(shardLines).map { case (ts, _) =>
      Fixtures.genMessages(ts, perTicker).collect { case Right(_) => 1 }.size
    }.sum
    val servers = shardLines.map(graft.streaming.WsReplay.server)
    val out = Files.createTempDirectory(s"graft-sbench-wire$shards")
    try {
      val endpoints = servers.map(s => s"localhost:${s.getLocalPort}")
      val df = spark.readStream.format("graft-socket")
        .option("shards", endpoints.mkString(","))
        // interleaved so the source's round-robin assignment hands each
        // shard exactly the tickers its server feeds
        .option("tickers", (0 until perShardTickers)
          .flatMap(i => shardTickers.map(_(i))).mkString(","))
        .option("channels", "orderbook_snapshot,orderbook_delta")
        .option("transport", "ws")
        .load()
      val t0 = System.nanoTime()
      val q = StreamPipeline.runUnifiedFrom(StreamPipeline.decode(df),
        out.toString,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      var n = 0L
      while (n < wantDeltas && System.nanoTime() < deadline) {
        q.processAllAvailable()
        n = try spark.read.parquet(s"$out/orderbook_deltas").count()
          catch { case _: Throwable => 0L }
        if (n < wantDeltas) Thread.sleep(50)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      val msgs = shardLines.map(_.size).sum
      require(n >= wantDeltas, s"wire ingest timed out: $n/$wantDeltas")
      println(f"""{"metric":"wire_ingest","shards":$shards,"messages":$msgs,"sec":$sec%.2f,"msgs_per_sec":${msgs / sec}%.0f,"delta_rows":$n}""")
    } finally servers.foreach(_.close())
  }

  /** Live top-of-book latency over the durable queue — the reference's
    * actual purpose (maintain a live book off the buffered stream),
    * measured as event→emit: a producer thread appends wall-clock-
    * stamped segments while [[graft.streaming.LiveBook.topOfBook]]
    * consumes them continuously; each emitted top-of-book row's
    * latency = emit time − append time of the message it reflects
    * (its (ticker, last_seq)). Includes micro-batch scheduling delay —
    * the number a serving SLO would see, not just compute time. */
  private def bookLatency(spark: org.apache.spark.sql.SparkSession,
      nTickers: Int = 20, perTicker: Int = 400): Unit = {
    import graft.streaming.{Connectors, LiveBook, QueueLog}
    val tickers = (0 until nTickers).map(i => f"KXLAT-$i%02d")
    val msgs = Fixtures.genMessages(tickers, perTicker)
    // interleave tickers by seq so every segment touches every book —
    // each micro-batch then emits one top-of-book row per ticker, and
    // per-ticker seq order is preserved (sortBy is stable)
    val keyed = msgs.map {
      case Left(s) => ((s.ticker, s.seq), Fixtures.envelopeJson(Left(s)))
      case Right(d) => ((d.ticker, d.seq), Fixtures.envelopeJson(Right(d)))
    }.sortBy(_._1._2)
    val qdir = Files.createTempDirectory("graft-sbench-book").toString

    val sendMs = new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]
    val latencies = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val emitted = new java.util.concurrent.atomic.AtomicLong(0L)

    // a live-book micro-batch carries a handful of rows per trigger —
    // 32 shuffle/state partitions are pure per-trigger overhead at this
    // batch size. A dedicated session pins the state topology small;
    // state store count is a per-QUERY property (fixed at first
    // checkpoint), so the analytics session's width is untouched.
    val live = spark.newSession()
    live.conf.set("spark.sql.shuffle.partitions", "4")

    val q = LiveBook.topOfBook(live,
        new Connectors.QueueMessageSource(qdir).messages(live))
      .writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[LiveBook.TopOfBook], _: Long) =>
          val rows = batch.collect() // ≤ one row per live ticker
          val now = System.currentTimeMillis()
          rows.foreach { r =>
            Option(sendMs.get((r.ticker, r.last_seq)))
              .foreach(t => latencies.add(now - t))
          }
          emitted.addAndGet(rows.length.toLong)
          ()
      }
      .start()

    // warm-up: one throwaway segment brings up the state store, codegen
    // and the first micro-batch before the clock starts (its ticker is
    // not in sendMs, so it records no latency)
    QueueLog.append(qdir, Fixtures.genMessages(Seq("KXWARM"), 11)
      .map(Fixtures.envelopeJson))
    val warmDeadline = System.currentTimeMillis() + 60000
    while (emitted.get() == 0 && System.currentTimeMillis() < warmDeadline)
      Thread.sleep(20)
    require(emitted.get() > 0, "book latency bench: warm-up never emitted")

    // producer: ~40 paced segments — a SEPARATE crash domain, exactly
    // like the reference's producer. The cadence (not the engine) sets
    // throughput here; the metric of interest is event→emit latency
    // under a keeping-up load, which is why this is measured instead of
    // a drain (queue_ingest above is the drain number).
    val t0 = System.currentTimeMillis()
    val per = math.max(1, keyed.size / 40)
    keyed.grouped(per).foreach { g =>
      val t = System.currentTimeMillis()
      g.foreach { case (k, _) => sendMs.put(k, t) }
      QueueLog.append(qdir, g.map(_._2))
      Thread.sleep(100)
    }
    q.processAllAvailable()
    q.stop()
    val wallSec = (System.currentTimeMillis() - t0) / 1e3

    val ls = latencies.iterator().asScala.toArray.sorted
    require(ls.nonEmpty, "book latency bench emitted nothing")
    def pct(p: Double): Long = ls(math.min(ls.length - 1,
      math.ceil(p * ls.length).toInt - 1).max(0))
    println(f"""{"metric":"book_latency","messages":${keyed.size},"emits":${emitted.get()},"p50_ms":${pct(0.50)},"p99_ms":${pct(0.99)},"max_ms":${ls.last},"msgs_per_sec":${keyed.size / wallSec}%.0f}""")
  }
}
