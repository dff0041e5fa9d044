package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live order-book state: per-ticker price-level map maintained across
  * micro-batches — snapshot messages RESET the book (a snapshot
  * supersedes every prior delta, SURVEY.md §7.4-3), delta messages
  * apply signed size changes (redis_client.py:81 semantics).
  *
  * This is the one operator in the reference's domain that is genuinely
  * stateful-streaming-shaped; `flatMapGroupsWithState` holds one small
  * book per ticker (≤101 levels × 2 sides — bounded, SURVEY.md §7.4-4),
  * so state size is O(live tickers), independent of stream length.
  * Emits the top-of-book after each batch per updated ticker.
  */
object LiveBook {

  /** One row per book event: snapshot levels (one row per level, all
    * sharing the message's seq) or single-level deltas. */
  final case class BookEvent(ticker: String, seq: Long, isSnapshot: Boolean,
      side: String, priceCents: Int, qty: Int)

  /** levels key = "side:priceCents" (encoder-friendly flat map). */
  final case class BookState(levels: Map[String, Int], lastSnapSeq: Long)

  final case class TopOfBook(ticker: String, last_seq: Long,
      best_yes_cents: Int, best_yes_qty: Int,
      best_no_cents: Int, best_no_qty: Int, n_levels: Int)

  private def key(side: String, price: Int) = s"$side:$price"

  def apply(ticker: String, events: Iterator[BookEvent],
      state: GroupState[BookState]): Iterator[TopOfBook] = {
    val sorted = events.toSeq.sortBy(e => (e.seq, e.priceCents, e.side))
    var st = state.getOption.getOrElse(BookState(Map.empty, -1L))
    sorted.foreach { e =>
      if (e.isSnapshot) {
        if (e.seq != st.lastSnapSeq) // first level of a new snapshot: reset
          st = BookState(Map.empty, e.seq)
        st = st.copy(levels = st.levels.updated(key(e.side, e.priceCents), e.qty))
      } else {
        val k = key(e.side, e.priceCents)
        val q = st.levels.getOrElse(k, 0) + e.qty
        st = st.copy(levels =
          if (q == 0) st.levels.removed(k) else st.levels.updated(k, q))
      }
    }
    state.update(st)
    if (sorted.isEmpty) Iterator.empty
    else {
      def best(side: String): (Int, Int) =
        st.levels.collect {
          case (k, q) if k.startsWith(side + ":") =>
            (k.drop(side.length + 1).toInt, q)
        }.maxByOption(_._1).getOrElse((-1, 0))
      val (yp, yq) = best("yes")
      val (np, nq) = best("no")
      Iterator(TopOfBook(ticker, sorted.last.seq, yp, yq, np, nq,
        st.levels.size))
    }
  }

  /** Wire messages ([[StreamPipeline.readMessages]] shape) → book
    * events: snapshots explode to per-level rows, deltas map 1:1.
    * Narrow until the single groupByKey(ticker) state shuffle. */
  def events(spark: SparkSession, messages: DataFrame): Dataset[BookEvent] = {
    import spark.implicits._
    val snaps = messages.where(col("type") === "orderbook_snapshot")
      .select(col("msg.market_ticker").as("ticker"), col("seq"),
        lit(true).as("isSnapshot"),
        explode(concat(
          expr("transform(msg.yes_dollars, l -> struct('yes' as side, cast(round(element_at(l, 1) * 100) as int) as priceCents, cast(element_at(l, 2) as int) as qty))"),
          expr("transform(msg.no_dollars, l -> struct('no' as side, cast(round(element_at(l, 1) * 100) as int) as priceCents, cast(element_at(l, 2) as int) as qty))")))
          .as("lvl"))
      .select(col("ticker"), col("seq"), col("isSnapshot"),
        col("lvl.side").as("side"), col("lvl.priceCents").as("priceCents"),
        col("lvl.qty").as("qty"))
    val deltas = messages.where(col("type") === "orderbook_delta")
      .select(col("msg.market_ticker").as("ticker"), col("seq"),
        lit(false).as("isSnapshot"), col("msg.side").as("side"),
        col("msg.price").as("priceCents"), col("msg.delta").as("qty"))
    snaps.unionByName(deltas).as[BookEvent]
  }

  /** Works on streaming and batch Datasets alike. */
  def topOfBook(spark: SparkSession, messages: DataFrame): Dataset[TopOfBook] = {
    import spark.implicits._
    events(spark, messages)
      .groupByKey(_.ticker)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(apply)
  }

  /** Event-time tumbling counts with a watermark — the standard
    * late-data-bounded windowed aggregation over the message stream
    * (delta `ts` is the exchange event time, redis_client.py:83). */
  def messageRatePerMinute(messages: DataFrame,
      lateness: String = "1 minute"): DataFrame =
    messages.where(col("type") === "orderbook_delta")
      .select(col("msg.market_ticker").as("ticker"),
        timestamp_millis(col("msg.ts")).as("event_time"))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), "1 minute"), col("ticker"))
      .agg(count(lit(1)).as("n_msgs"))
      .select(col("window.start").as("window_start"), col("ticker"),
        col("n_msgs"))
}
