package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: pair each yes-side delta with the
  * no-side deltas of the same ticker within ±5 s of event time — the
  * two-sided-flow correlation (book imbalance) query shape.
  *
  * Both sides carry a watermark, so the join state store evicts rows
  * once they can no longer match (bounded memory on an unbounded
  * stream); the ±5 s band keeps matched state per ticker tiny. Inner
  * matches emit as soon as both rows arrive — no end-of-window latency.
  */
object StreamJoins {

  def yesNoPairs(messages: DataFrame, watermark: String = "1 minute",
      bandSec: Int = 5): DataFrame = {
    def side(tag: String) = messages
      .where(col("type") === "orderbook_delta" && col("msg.side") === tag)
      .select(col("msg.market_ticker").as(s"${tag}_ticker"),
        timestamp_millis(col("msg.ts")).as(s"${tag}_time"),
        col("msg.price").as(s"${tag}_price"),
        col("msg.delta").as(s"${tag}_delta"),
        col("seq").as(s"${tag}_seq"))
      .withWatermark(s"${tag}_time", watermark)
    side("yes").join(side("no"),
      col("yes_ticker") === col("no_ticker") &&
        col("no_time") >= col("yes_time") - expr(s"INTERVAL $bandSec SECONDS") &&
        col("no_time") <= col("yes_time") + expr(s"INTERVAL $bandSec SECONDS"))
      .select(col("yes_ticker").as("ticker"),
        col("yes_seq"), col("no_seq"),
        col("yes_price"), col("no_price"),
        col("yes_delta"), col("no_delta"))
  }

  /** LEFT-OUTER stream-stream interval join: every yes-side delta
    * emits — paired rows as soon as both sides arrive (inner
    * semantics), and UNMATCHED yes rows with null no-side columns once
    * the watermark passes their join window, i.e. once a match has
    * provably not happened. That late, state-eviction-driven null
    * emission is the semantic difference from [[yesNoPairs]]: an
    * unanswered order-flow probe is a SIGNAL (one-sided pressure), and
    * an inner join silently drops it.
    *
    * State bounds are the inner join's: both sides watermarked, the
    * ±5 s band caps match state per ticker; the outer side's rows are
    * additionally held only until watermark − 5 s passes their event
    * time, then emitted-with-nulls and evicted. Emission latency for
    * unmatched rows is therefore watermark delay + band — the price of
    * proving a negative on an unbounded stream. */
  def yesNoPairsOuter(messages: DataFrame, watermark: String = "1 minute",
      bandSec: Int = 5): DataFrame = {
    def side(tag: String) = messages
      .where(col("type") === "orderbook_delta" && col("msg.side") === tag)
      .select(col("msg.market_ticker").as(s"${tag}_ticker"),
        timestamp_millis(col("msg.ts")).as(s"${tag}_time"),
        col("msg.price").as(s"${tag}_price"),
        col("msg.delta").as(s"${tag}_delta"),
        col("seq").as(s"${tag}_seq"))
      .withWatermark(s"${tag}_time", watermark)
    side("yes").join(side("no"),
      col("yes_ticker") === col("no_ticker") &&
        col("no_time") >= col("yes_time") - expr(s"INTERVAL $bandSec SECONDS") &&
        col("no_time") <= col("yes_time") + expr(s"INTERVAL $bandSec SECONDS"),
      "leftOuter")
      .select(col("yes_ticker").as("ticker"),
        col("yes_seq"), col("no_seq"),
        col("yes_price"), col("no_price"),
        col("yes_delta"), col("no_delta"))
  }

  /** Stream-STATIC enrichment: attach a slow-changing dimension (the
    * ticker → series map A1's discovery produces) to the delta stream.
    * The static side is re-resolved per micro-batch (standard
    * stream-static semantics — a dim refresh lands on the next batch)
    * and explicitly broadcast, so the hot path stays stateless and
    * shuffle-free: no watermark, no state store, each micro-batch is
    * one broadcast-hash probe per row. LEFT join: facts with an
    * unknown ticker survive with a null dimension — enrichment must
    * never drop book events (the router's dead-letter branch owns
    * malformed input, not this join). */
  def enrichDeltas(messages: DataFrame, tickerDim: DataFrame): DataFrame =
    messages
      .where(col("type") === "orderbook_delta")
      .select(col("msg.market_ticker").as("ticker"),
        col("msg.side").as("side"), col("msg.price").as("price"),
        col("msg.delta").as("delta"), col("seq"))
      .join(broadcast(tickerDim), Seq("ticker"), "left")
}
