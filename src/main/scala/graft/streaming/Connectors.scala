package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connector seam (SURVEY.md §7.1 step 5): the environment-dependent
  * edges of the reference — market discovery (kalshi_rest_client.py:
  * 60-74) and the message feed (kalshi_ws_client.py:108-148) — behind
  * traits, so the engine's pipeline code never knows whether messages
  * come from a live socket or a replay directory. Offline, the replay
  * implementations are the default; a live deployment supplies
  * implementations backed by the real REST/WSS endpoints (driver-side
  * HTTP for discovery, a custom streaming source for the feed) without
  * touching anything downstream.
  */
object Connectors {

  /** A1: market discovery — returns the tickers to subscribe. */
  trait TickerDiscovery {
    def tickers(): Seq[String]
  }

  /** Offline default: a fixed ticker list (the reference's discovery
    * reduces to exactly this after its one REST call). */
  final class StaticTickers(ts: Seq[String]) extends TickerDiscovery {
    override def tickers(): Seq[String] = ts
  }

  /** A2: the message feed as an unbounded wire-envelope DataFrame. */
  trait MessageSource {
    def messages(spark: SparkSession): DataFrame
  }

  /** Offline default: NDJSON replay through the file source —
    * checkpointable, replayable, and schema-identical to a live feed. */
  final class FileReplaySource(dir: String, maxFilesPerTrigger: Int = 100)
      extends MessageSource {
    override def messages(spark: SparkSession): DataFrame =
      StreamPipeline.readMessages(spark, dir, maxFilesPerTrigger)
  }

  /** Optional connector credentials: access-key id + PKCS#8 PEM key
    * file, the two secrets the reference reads from its environment
    * (kalshi_rest_client.py:19-27). */
  final case class Credentials(accessKey: String, privateKeyFile: String)

  /** Live-path implementation: the [[WireSocketProvider graft-socket]]
    * DSv2 source (subscribe handshake + fail-stop seq validation,
    * kalshi_ws_client.py:108-148), decoded by the SAME
    * [[StreamPipeline.decode]] the replay path uses — downstream code
    * cannot tell the feeds apart. */
  final class SocketMessageSource(host: String, port: Int,
      tickers: Seq[String], failOnGap: Boolean = true,
      credentials: Option[Credentials] = None)
      extends MessageSource {
    override def messages(spark: SparkSession): DataFrame = {
      val base = spark.readStream
        .format("graft-socket")
        .option("host", host)
        .option("port", port.toString)
        .option("tickers", tickers.mkString(","))
        .option("failOnGap", failOnGap.toString)
      val authed = credentials.fold(base)(c =>
        base.option("accessKey", c.accessKey)
          .option("privateKeyFile", c.privateKeyFile))
      StreamPipeline.decode(authed.load())
    }
  }

  /** Durable-buffer implementation: the [[QueueLogProvider graft-queue]]
    * source over a segment log on shared storage — the reference's
    * Redis-Streams producer/consumer split (redis_client.py:50-193):
    * the producer appends segments ([[QueueLog.append]]) in its own
    * crash domain; a (re)started query resumes from its checkpointed
    * (segment, line) offset with no loss and no dupes. */
  final class QueueMessageSource(dir: String,
      maxSegmentsPerTrigger: Long = Long.MaxValue)
      extends MessageSource {
    override def messages(spark: SparkSession): DataFrame = {
      val base = spark.readStream.format("graft-queue").option("path", dir)
      val bounded =
        if (maxSegmentsPerTrigger == Long.MaxValue) base
        else base.option("maxSegmentsPerTrigger", maxSegmentsPerTrigger.toString)
      StreamPipeline.decode(bounded.load())
    }
  }

  /** Subscription filter: the WSS subscribe command's ticker list
    * (kalshi_ws_client.py:119-127) expressed as a pushdown-friendly
    * predicate on the stream. */
  def subscribed(messages: DataFrame, discovery: TickerDiscovery): DataFrame =
    messages.where(col("msg.market_ticker")
      .isin(discovery.tickers(): _*))
}
