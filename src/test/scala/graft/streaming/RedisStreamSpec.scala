package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.Normalize

/** The queue seam at the WIRE level: the production [[RespClient]] and
  * `graft-redis` DSv2 source against an in-process RESP server
  * ([[MiniRedis]]) — XADD/XRANGE/XDEL byte-for-byte
  * (redis_client.py:50,111,193), consume-commit restart semantics, the
  * trim-past-checkpoint tripwire, and admission control. */
class RedisStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private val DeltaFields =
    "type,sid,seq,market_ticker,price_dollars,delta,side,ingestion_ts"

  private def deltaEntry(seq: Long, ticker: String = "KXBTC-A",
      price: String = "0.4300", delta: String = "7", side: String = "yes")
      : Seq[(String, String)] = Seq(
    "type" -> "orderbook_delta", "sid" -> "2", "seq" -> seq.toString,
    "market_ticker" -> ticker, "price_dollars" -> price,
    "delta" -> delta, "side" -> side,
    "ingestion_ts" -> (1700000000000L + seq).toString)

  private def reader(srv: MiniRedis, key: String) =
    spark.readStream.format("graft-redis")
      .option("host", "127.0.0.1").option("port", srv.port)
      .option("key", key).option("fields", DeltaFields)

  test("RespClient speaks XADD/XRANGE/XDEL/XLEN/XINFO over the socket") {
    val srv = new MiniRedis
    try {
      val c = new RespClient("127.0.0.1", srv.port)
      try {
        val ids = (1L to 5L).map(i => c.xadd("s", deltaEntry(i)))
        assert(ids == ids.sorted && ids.distinct.size == 5)
        assert(c.xlen("s") == 5)
        assert(c.latestId("s").contains(ids.last))
        // inclusive range returns fields in insertion order
        val all = c.xrange("s", "-", "+")
        assert(all.map(_._1) == ids)
        assert(all.head._2.toMap.apply("seq") == "1")
        // exclusive-start cursor paging: the graft-redis reader's loop
        val afterTwo = c.xrange("s", s"(${ids(1)}", "+")
        assert(afterTwo.map(_._1) == ids.drop(2))
        // bounded page
        assert(c.xrange("s", "-", "+", Some(2)).size == 2)
        // retention + the deletion high-water mark
        assert(c.xdel("s", ids.take(2)) == 2)
        assert(c.xlen("s") == 3)
        assert(c.maxDeletedId("s") == ids(1))
      } finally c.close()
    } finally srv.stop()
  }

  test("consume-commit restart: each entry lands exactly once across " +
    "two query incarnations and a committed trim") {
    val srv = new MiniRedis
    try {
      val key = "orderbook:delta"
      (1L to 5L).foreach(i =>
        RedisQueue.append("127.0.0.1", srv.port, key, deltaEntry(i)))
      val ckpt = Files.createTempDirectory("redis-ckpt").toString
      val outDir = Files.createTempDirectory("redis-out").toString
      def runOnce(): Unit = {
        val q = reader(srv, key).load()
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce()
      val committed = StreamId.parse(
        spark.read.parquet(outDir).selectExpr("max(redis_stream_id)")
          .head.getString(0))
      // retention of the COMMITTED prefix is safe by contract
      assert(RedisQueue.trim("127.0.0.1", srv.port, key, committed) == 5)
      (6L to 8L).foreach(i =>
        RedisQueue.append("127.0.0.1", srv.port, key, deltaEntry(i)))
      runOnce() // second incarnation resumes from the checkpoint
      val out = spark.read.parquet(outDir)
      assert(out.count() == 8)
      assert(out.select("redis_stream_id").distinct.count() == 8)
      // the wire rows feed the existing normalize path unchanged
      val flat = Normalize.flattenDeltas(Normalize.parseDeltaEntries(out))
      assert(flat.count() == 8)
      assert(flat.selectExpr("sum(delta)").head.getLong(0) == 8 * 7)
    } finally srv.stop()
  }

  test("trim past the checkpoint fail-stops the query (lost-data restart)") {
    val srv = new MiniRedis
    try {
      val key = "orderbook:delta"
      (1L to 4L).foreach(i =>
        RedisQueue.append("127.0.0.1", srv.port, key, deltaEntry(i)))
      val ckpt = Files.createTempDirectory("redis-ckpt2").toString
      val outDir = Files.createTempDirectory("redis-out2").toString
      val q1 = reader(srv, key).load()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination()
      // 2 more entries arrive, then an over-eager operator trims THROUGH
      // the first of them — past every committed offset
      val id5 = RedisQueue.append("127.0.0.1", srv.port, key, deltaEntry(5))
      RedisQueue.append("127.0.0.1", srv.port, key, deltaEntry(6))
      srv.trimThrough(key, id5)
      val q2 = reader(srv, key).load()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      val e = intercept[StreamingQueryException](q2.awaitTermination())
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain(e).exists(c => c.isInstanceOf[IllegalStateException] ||
        Option(c.getMessage).exists(_.contains("lost-data restart"))))
    } finally srv.stop()
  }

  test("appendBatch XADDs executor-side; explicit-id replay is idempotent") {
    val srv = new MiniRedis
    try {
      import spark.implicits._
      val df = (1L to 6L).map(i => (s"${1000 + i}-0", s"T$i", i.toString))
        .toDF("sid", "market_ticker", "delta")
      // reference shape: server ids, at-least-once — n entries land
      RedisQueue.appendBatch(df, "127.0.0.1", srv.port, "plain",
        Seq("market_ticker", "delta"))
      val c = new RespClient("127.0.0.1", srv.port)
      try {
        assert(c.xlen("plain") == 6)
        assert(c.xrange("plain", "-", "+").map(_._2.toMap.apply("delta"))
          .toSet == (1L to 6L).map(_.toString).toSet)
        // idempotent shape: rows carry monotone ids; a full replay of
        // the same frame is a no-op instead of 6 duplicates
        RedisQueue.appendBatch(df.repartition(1), "127.0.0.1", srv.port,
          "keyed", Seq("market_ticker", "delta"), idCol = Some("sid"))
        assert(c.xlen("keyed") == 6)
        RedisQueue.appendBatch(df.repartition(1), "127.0.0.1", srv.port,
          "keyed", Seq("market_ticker", "delta"), idCol = Some("sid"))
        assert(c.xlen("keyed") == 6, "replayed explicit-id batch duplicated")
        // and the written stream round-trips through the graft-redis
        // source: full producer->consumer wire loop
        val ckpt = Files.createTempDirectory("redis-ckpt-sink").toString
        val outDir = Files.createTempDirectory("redis-out-sink").toString
        val q = spark.readStream.format("graft-redis")
          .option("host", "127.0.0.1").option("port", srv.port)
          .option("key", "keyed").option("fields", "market_ticker,delta")
          .load()
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        assert(spark.read.parquet(outDir).count() == 6)
      } finally c.close()
    } finally srv.stop()
  }

  test("maxEntriesPerTrigger bounds batches without dropping the tail") {
    val srv = new MiniRedis
    try {
      val key = "s"
      (1L to 7L).foreach(i =>
        RedisQueue.append("127.0.0.1", srv.port, key, deltaEntry(i)))
      val ckpt = Files.createTempDirectory("redis-ckpt3").toString
      val outDir = Files.createTempDirectory("redis-out3").toString
      val q = reader(srv, key).option("maxEntriesPerTrigger", 3).load()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.read.parquet(outDir)
      assert(out.count() == 7)
      assert(out.select("redis_stream_id").distinct.count() == 7)
    } finally srv.stop()
  }
}
