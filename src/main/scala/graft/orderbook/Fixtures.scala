package graft.orderbook

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Deterministic in-memory order-book message fixtures (FIXTURES.md §1).
  *
  * No RNG, no clock: every field is index arithmetic, so unit tests,
  * property checks, and the streaming replay all see byte-identical
  * inputs on every run. Shapes mirror the wire format
  * (kalshi_ws_client.py:134-148 envelope, redis_client.py:36-47 /
  * :73-85 buffered fields).
  */
object Fixtures {

  val tickers: Seq[String] = Seq("KXTEST-A", "KXTEST-B", "KXTEST-C")
  val baseTs = 1704067200000L // 2024-01-01T00:00:00Z
  val msgsPerTicker = 20

  final case class Snap(sid: Long, seq: Long, ticker: String,
      ingestionTs: Long, streamId: String,
      yes: Seq[(Double, Int)], no: Seq[(Double, Int)])
  final case class Delta(sid: Long, seq: Long, ticker: String,
      ingestionTs: Long, streamId: String,
      side: String, priceCents: Int, delta: Int)

  /** Deterministic message stream generator: per ticker, seq 1..n;
    * every 10th (seq 1, 11, …) is a full snapshot, the rest deltas.
    * Same arithmetic at any size — the 3×20 default feeds the unit
    * tests, StreamBench scales it up. */
  def genMessages(tickerNames: Seq[String],
      perTicker: Int): Seq[Either[Snap, Delta]] =
    tickerNames.zipWithIndex.flatMap { case (t, ti) =>
      (1 to perTicker).map { seq =>
        val gi = ti.toLong * perTicker + seq // global index, unique
        val ts = baseTs + 1000L * gi
        val id = s"$ts-0"
        if (seq % 10 == 1) {
          val yes = (0 until 3).map(k => ((40 + k) / 100.0, 100 * (k + 1) + seq))
          val no  = (0 until 3).map(k => ((55 + k) / 100.0, 80 * (k + 1) + seq))
          Left(Snap(ti + 1L, seq.toLong, t, ts, id, yes, no))
        } else {
          val side = if (seq % 2 == 0) "yes" else "no"
          Right(Delta(ti + 1L, seq.toLong, t, ts, id, side,
            40 + seq % 5, (seq % 11) - 5))
        }
      }
    }

  lazy val messages: Seq[Either[Snap, Delta]] =
    genMessages(tickers, msgsPerTicker)

  lazy val snaps: Seq[Snap] = messages.collect { case Left(s) => s }
  lazy val deltas: Seq[Delta] = messages.collect { case Right(d) => d }

  private def ladderJson(l: Seq[(Double, Int)]): String =
    l.map { case (p, c) => s"[$p,$c]" }.mkString("[", ",", "]")
  private def centsJson(l: Seq[(Double, Int)]): String =
    l.map { case (p, c) => s"[${math.round(p * 100)},$c]" }.mkString("[", ",", "]")

  /** Wire-format NDJSON line for a message (envelope incl. nested msg). */
  def envelopeJson(m: Either[Snap, Delta]): String = m match {
    case Left(s) =>
      s"""{"type":"orderbook_snapshot","sid":${s.sid},"seq":${s.seq},""" +
      s""""msg":{"market_ticker":"${s.ticker}","market_id":"m-${s.sid}",""" +
      s""""yes_dollars":${ladderJson(s.yes)},"no_dollars":${ladderJson(s.no)},""" +
      s""""yes":${centsJson(s.yes)},"no":${centsJson(s.no)}}}"""
    case Right(d) =>
      s"""{"type":"orderbook_delta","sid":${d.sid},"seq":${d.seq},""" +
      s""""msg":{"market_ticker":"${d.ticker}","market_id":"m-${d.sid}",""" +
      s""""price":${d.priceCents},"price_dollars":${d.priceCents / 100.0},""" +
      s""""delta":${d.delta},"side":"${d.side}","ts":${d.ingestionTs}}}"""
  }

  def ndjsonLines: Seq[String] = messages.map(envelopeJson)

  private def strDf(spark: SparkSession, cols: Seq[String],
      rows: Seq[Seq[String]]): DataFrame = {
    val schema = StructType(cols.map(StructField(_, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_: _*)), 2), schema)
  }

  /** Snapshot XRANGE entries — all values strings, ladders JSON text,
    * exactly as Redis hands them back (redis_client.py:126-133). */
  def snapshotEntries(spark: SparkSession,
      duplicateFirst: Boolean = false): DataFrame = {
    val base = snaps.map(s => Seq(s.streamId, s.ingestionTs.toString,
      s.ticker, s.sid.toString, s.seq.toString,
      ladderJson(s.yes), ladderJson(s.no)))
    val rows = if (duplicateFirst) base.head +: base else base
    strDf(spark, Seq("redis_stream_id", "ingestion_ts", "market_ticker",
      "sid", "seq", "yes_dollars", "no_dollars"), rows)
  }

  /** Delta XRANGE entries (string-typed). `dropSeq` simulates a transport
    * gap; `duplicateFirst` simulates an at-least-once replay. */
  def deltaEntries(spark: SparkSession, duplicateFirst: Boolean = false,
      dropSeq: Option[Long] = None): DataFrame = {
    val kept = deltas.filterNot(d => dropSeq.contains(d.seq))
    val base = kept.map(d => Seq(d.streamId, d.ingestionTs.toString,
      d.ticker, d.sid.toString, d.seq.toString, d.side,
      (d.priceCents / 100.0).toString, d.delta.toString))
    val rows = if (duplicateFirst) base.head +: base else base
    strDf(spark, Seq("redis_stream_id", "ingestion_ts", "market_ticker",
      "sid", "seq", "side", "price_dollars", "delta"), rows)
  }
}
