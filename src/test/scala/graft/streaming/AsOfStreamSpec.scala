package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.Fixtures

class AsOfStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  test("streaming as-of join equals the batch window as-of once the " +
    "watermark finalizes each trade") {
    val in = Files.createTempDirectory("graft-asof-in")
    val ck = Files.createTempDirectory("graft-asof-ck")
    def stamp(p: java.nio.file.Path, i: Int): Unit =
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    // shuffle lines across files: within-watermark disorder is the
    // case the state buffer exists for (deterministic interleave)
    val lines = Fixtures.ndjsonLines
    val reordered = lines.grouped(6).toSeq.flatMap(_.reverse)
    reordered.grouped(20).zipWithIndex.foreach { case (g, i) =>
      stamp(Files.write(in.resolve(f"part-$i%02d.ndjson"), g.asJava), i)
    }
    // watermark sentinels on an unused ticker (quotes only — they emit
    // nothing themselves, they just push event time forward)
    def sentinel(seq: Long, offsetMs: Long) = Fixtures.envelopeJson(
      Right(Fixtures.Delta(1L, seq, "KXTEST-W",
        Fixtures.baseTs + offsetMs, s"${Fixtures.baseTs + offsetMs}-0",
        "yes", 40, 1)))
    stamp(Files.write(in.resolve("part-90.ndjson"),
      Seq(sentinel(900L, 20000000L)).asJava), 90)
    stamp(Files.write(in.resolve("part-91.ndjson"),
      Seq(sentinel(901L, 30000000L)).asJava), 91)
    val q = AsOfStream.enrich(spark,
        StreamPipeline.readMessages(spark, in.toString, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("asof_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4),
        r.getInt(6), r.getLong(7))).toSet

    // ground truth: the BATCH as-of — carry the latest yes-side value
    // in (ts, seq) order with an ignore-nulls window (ob14's shape)
    val base = StreamPipeline.parseMessages(spark, lines)
      .where(col("type") === "orderbook_delta")
      .select(col("msg.market_ticker").as("ticker"),
        (col("msg.side") === "yes").as("is_quote"),
        col("msg.ts").as("ts"), col("seq"),
        col("msg.price").cast("int").as("price"))
    val w = Window.partitionBy(col("ticker")).orderBy(col("ts"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = base
      .withColumn("q", last(
        when(col("is_quote"), struct(col("seq").as("qseq"),
          col("price").as("qprice"), col("ts").as("qts"))),
        ignoreNulls = true).over(w))
      .where(!col("is_quote"))
      .select(col("ticker"), col("seq"),
        coalesce(col("q.qseq"), lit(-1L)).as("quote_seq"),
        coalesce(col("q.qprice"), lit(-1)).as("quote_price"),
        coalesce(col("ts") - col("q.qts"), lit(-1L)).as("staleness_ms"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toSet
    assert(streamed === expected)
    assert(streamed.nonEmpty)
    // out-of-order arrival really happened AND was absorbed: staleness
    // is the 2-second yes/no cadence everywhere a quote preceded
    assert(streamed.forall(t => t._5 > 0 || t._3 == -1L))
  }
}
