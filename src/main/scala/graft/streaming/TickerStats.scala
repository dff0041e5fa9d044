package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-ticker running tick statistics on the Spark 4
  * `transformWithState` arbitrary-state API — the successor to
  * `flatMapGroupsWithState` (LiveBook uses the classic API; this is
  * the modern twin): explicit named state handles, per-state TTL, and
  * a processor object whose lifecycle the state store manages.
  *
  * State is one fixed-size row per live ticker (count, last seq/price,
  * min/max) — O(live tickers) like the reference's in-memory
  * `expected_seq` map (kalshi_ws_client.py:130), but fault-tolerant in
  * the checkpointed store and off-heap under the RocksDB provider.
  * A production deployment would set a TTL so delisted tickers age
  * out; the spec exercises TTLConfig.NONE (retain forever), matching
  * the reference's behavior.
  */
object TickerStats {

  final case class Tick(ticker: String, seq: Long, priceCents: Int)

  final case class Stat(ticker: String, n_msgs: Long, last_seq: Long,
      last_price: Int, min_price: Int, max_price: Int)

  /** Fold incoming ticks (in seq order) into the per-ticker stat row;
    * emits the updated row once per micro-batch per active key. */
  class Processor extends StatefulProcessor[String, Tick, Stat] {
    @transient private var state: ValueState[Stat] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Stat]("stat",
        Encoders.product[Stat], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Tick],
        tv: TimerValues): Iterator[Stat] = {
      val sorted = rows.toSeq.sortBy(_.seq)
      if (sorted.isEmpty) Iterator.empty
      else {
        var st =
          if (state.exists()) state.get()
          else Stat(key, 0L, -1L, -1, Int.MaxValue, Int.MinValue)
        sorted.foreach { t =>
          st = Stat(key, st.n_msgs + 1, t.seq, t.priceCents,
            math.min(st.min_price, t.priceCents),
            math.max(st.max_price, t.priceCents))
        }
        state.update(st)
        Iterator(st)
      }
    }
  }

  /** Wire messages ([[StreamPipeline.readMessages]] shape) → per-ticker
    * stat stream. Narrow projection, one state shuffle on the ticker. */
  def run(spark: SparkSession, messages: DataFrame): Dataset[Stat] = {
    import spark.implicits._
    messages.where(col("type") === "orderbook_delta")
      .select(col("msg.market_ticker").as("ticker"), col("seq"),
        col("msg.price").as("priceCents"))
      .as[Tick]
      .groupByKey(_.ticker)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update())
  }
}
