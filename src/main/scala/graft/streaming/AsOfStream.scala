package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING as-of join — ob14's batch semantics, live: every no-side
  * event ("trade") is enriched with the latest yes-side event
  * ("quote") at-or-before its event time, per ticker, tolerating
  * out-of-order arrival up to the watermark.
  *
  * Spark has no native stream-stream as-of join (interval joins pair
  * ALL rows in a band, not the latest-before), so this is the
  * custom-state spelling: both sides union into ONE keyed stream and
  * `flatMapGroupsWithState` buffers per ticker until the watermark
  * proves each trade's as-of answer final — a quote with a smaller
  * event time can no longer arrive — then emits in (ts, seq) order.
  *
  * State bounds (the part that survives 100 TB/day): per ticker, only
  * trades NEWER than the watermark wait, and of the quotes at-or-below
  * the watermark only the LATEST is kept (any future trade's event
  * time exceeds the watermark, so older quotes can never win again) —
  * state is O(in-flight window), independent of stream history,
  * exactly like the interval join's eviction. Emission latency for a
  * trade is the watermark delay — the price of proving "no earlier
  * quote is still in flight" on an unbounded stream.
  */
object AsOfStream {

  /** event_time carries the watermark tag into the typed stream (a
    * projection that drops the watermarked column drops the watermark,
    * and EventTimeTimeout then fails analysis). */
  final case class Tick(ticker: String, is_quote: Boolean,
      event_time: java.sql.Timestamp, ts: Long, seq: Long, price: Int)
  final case class Enriched(ticker: String, trade_seq: Long,
      trade_ts: Long, trade_price: Int, quote_seq: Long, quote_ts: Long,
      quote_price: Int, staleness_ms: Long)
  /** (quotes, trades) as (ts, seq, price) triples. */
  final case class Buf(quotes: List[(Long, Long, Int)],
      trades: List[(Long, Long, Int)])

  /** Latest quote at-or-before the trade in (ts, seq) wire order —
    * lexicographic, so a same-millisecond quote counts only if its seq
    * precedes the trade's (matches a window ordered by (ts, seq)). */
  private def asOf(quotes: List[(Long, Long, Int)], ts: Long, seq: Long) = {
    val elig = quotes.filter(q =>
      q._1 < ts || (q._1 == ts && q._2 <= seq))
    if (elig.isEmpty) None else Some(elig.maxBy(q => (q._1, q._2)))
  }

  def join(ticker: String, rows: Iterator[Tick],
      state: GroupState[Buf]): Iterator[Enriched] = {
    val prev = state.getOption.getOrElse(Buf(Nil, Nil))
    val in = rows.toSeq
    val quotes = prev.quotes ++
      in.filter(_.is_quote).map(t => (t.ts, t.seq, t.price))
    val trades = prev.trades ++
      in.filter(!_.is_quote).map(t => (t.ts, t.seq, t.price))
    val wm = state.getCurrentWatermarkMs()
    // a trade's answer is final once no quote <= its ts can still
    // arrive, i.e. once the watermark passes the trade
    val (ready, pending) = trades.partition(_._1 <= wm)
    val out = ready.sortBy(t => (t._1, t._2)).map { case (ts, seq, p) =>
      asOf(quotes, ts, seq) match {
        case Some((qts, qseq, qp)) =>
          Enriched(ticker, seq, ts, p, qseq, qts, qp, ts - qts)
        case None => Enriched(ticker, seq, ts, p, -1L, -1L, -1, -1L)
      }
    }
    // quote eviction: of the quotes the watermark has passed, only the
    // latest can ever answer a future (ts > wm) trade
    val (old, live) = quotes.partition(_._1 <= wm)
    val kept = (if (old.isEmpty) Nil
                else List(old.maxBy(q => (q._1, q._2)))) ++ live
    state.update(Buf(kept, pending))
    // wake up when the watermark next passes a pending trade, even if
    // this ticker sees no new rows in that trigger
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
    out.iterator
  }

  /** Quotes = yes-side deltas, trades = no-side deltas, from the
    * decoded message stream ([[StreamPipeline.readMessages]]).
    * Streaming-only by design: batch execution runs with watermark 0,
    * which (correctly) withholds everything — the batch spelling of
    * this operator is ob14's window as-of, which the spec uses as the
    * ground-truth twin. */
  def enrich(spark: SparkSession, messages: DataFrame,
      watermark: String = "1 minute"): Dataset[Enriched] = {
    import spark.implicits._
    messages
      .where(col("type") === "orderbook_delta")
      .select(col("msg.market_ticker").as("ticker"),
        (col("msg.side") === "yes").as("is_quote"),
        timestamp_millis(col("msg.ts")).as("event_time"),
        col("msg.ts").as("ts"), col("seq"),
        col("msg.price").cast("int").as("price"))
      .withWatermark("event_time", watermark)
      .as[Tick]
      .groupByKey(_.ticker)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(join)
  }
}
