package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The pipeline on a genuinely unbounded source (no files, no replay):
  * the rate source synthesizes delta messages at a fixed rate and the
  * same route/normalize path consumes them — the shape a live WSS
  * connector plugs into via [[Connectors.MessageSource]]. */
class RateSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  /** Rate rows → wire-envelope shape (type/sid/seq/msg columns the
    * router expects), deterministic fields from the row index. */
  private def rateMessages = spark.readStream
    .format("rate").option("rowsPerSecond", "500").load()
    .select(
      lit("orderbook_delta").as("type"),
      (col("value") % 3 + 1).as("sid"),
      col("value").as("seq"),
      struct(
        concat(lit("KXRATE-"), (col("value") % 3).cast("string"))
          .as("market_ticker"),
        lit("m-rate").as("market_id"),
        (col("value") % 99 + 1).cast("int").as("price"),
        ((col("value") % 99 + 1) / 100.0).as("price_dollars"),
        (col("value") % 21 - 10).cast("int").as("delta"),
        when(col("value") % 2 === 0, "yes").otherwise("no").as("side"),
        unix_millis(col("timestamp")).as("ts")).as("msg"),
      unix_millis(col("timestamp")).as("ingestion_ts"),
      concat(col("value") % 3 + 1, lit("-"), col("value"))
        .as("redis_stream_id"))

  test("router + normalize consume an unbounded rate stream") {
    val out = Files.createTempDirectory("graft-rate-out")
    val q = StreamPipeline.routeDeltas(rateMessages)
      .writeStream.format("memory").queryName("rate_deltas")
      .outputMode("append")
      .option("checkpointLocation", s"$out/_ckpt")
      .start()
    try {
      q.processAllAvailable()
      Thread.sleep(1500)
      q.processAllAvailable()
    } finally q.stop() // freeze the memory table before asserting
    val rows = spark.table("rate_deltas").collect()
    assert(rows.nonEmpty, "no rows flowed from the rate source")
    // normalized shape: typed facts with the synthetic lineage id
    assert(spark.table("rate_deltas").schema.fieldNames.toSeq ===
      Seq("timestamp", "ticker", "side", "price_dollars", "delta",
        "redis_stream_id"))
    assert(rows.forall(_.getAs[String]("ticker").startsWith("KXRATE-")))
  }
}
