package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING heavy hitters — the unbounded-input twin of txt18's batch
  * Misra–Gries (`TextAnalysis.heavyHitters`): per-token exact counting
  * over a stream needs O(vocabulary) state, which is exactly the thing
  * watermarks can't bound (a token seen once must be remembered
  * forever). Misra–Gries caps it: each state cell holds at most K
  * (token, counter) pairs, and any token whose true frequency exceeds
  * 1/K of its cell's stream survives in the summary — the same
  * candidates ⊇ heavy-tokens guarantee the batch operator pins, now
  * maintained incrementally across micro-batches.
  *
  * Sharding: tokens are routed to `buckets` state cells by content
  * hash, so summary maintenance parallelizes across the state shuffle
  * like any keyed aggregation — total state is O(buckets · K),
  * independent of stream length and vocabulary, and every occurrence
  * of one token lands in the same cell (the per-cell MG guarantee is
  * therefore a global one: a token with global count > cellN/K is in
  * its cell's summary). Each micro-batch emits the full summaries of
  * the cells it touched (Update semantics — downstream keeps the
  * latest snapshot per cell; counters are MG lower bounds:
  * true − cellN/K ≤ counter ≤ true).
  *
  * The reference has no streaming analytics at all (counts happen in
  * Polars after persistence — nt_etl_order_book/consumer.py); this is
  * the operator its dashboard would need the moment "top tickers by
  * message volume" must be live instead of nightly.
  */
object StreamHeavyHitters {

  final case class Tok(bucket: Int, token: String)
  final case class MgState(tokens: List[String], counts: List[Long],
      seen: Long)
  final case class Summary(bucket: Int, token: String, lower_bound: Long,
      cell_seen: Long)

  /** One Misra–Gries summary per bucket key, K counters. Lists (not a
    * Map) keep the state encoder a flat product of array columns. */
  class Processor(k: Int) extends StatefulProcessor[Int, Tok, Summary] {
    @transient private var state: ValueState[MgState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[MgState]("mg",
        Encoders.product[MgState], TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[Tok],
        tv: TimerValues): Iterator[Summary] = {
      // ONE store lookup per key per batch — each exists()/get() is a
      // state-store read on the hot path under RocksDB
      val prior = if (state.exists()) Some(state.get()) else None
      val next = mgFold(prior, rows.map(_.token), k)
      state.update(next)
      next.tokens.zip(next.counts).iterator
        .map { case (tk, c) => Summary(key, tk, c, next.seen) }.toList
        .iterator
    }
  }

  /** The pure Misra–Gries fold one state cell runs per micro-batch —
    * extracted so MgProps can pin the sketch invariants directly
    * (candidates ⊇ tokens with count > seen/k; every counter a valid
    * lower bound: true − seen/k ≤ counter ≤ true) across ARBITRARY
    * chunkings of the stream, the exact incremental-maintenance
    * regime st18 replays. */
  private[streaming] def mgFold(prior: Option[MgState],
      toks: Iterator[String], k: Int): MgState = {
    val m = prior match {
      case Some(st) => scala.collection.mutable.LinkedHashMap(
        st.tokens.zip(st.counts): _*)
      case None => scala.collection.mutable.LinkedHashMap.empty[String, Long]
    }
    var seen = prior.map(_.seen).getOrElse(0L)
    toks.foreach { t =>
      seen += 1
      m.get(t) match {
        case Some(c) => m(t) = c + 1
        case None if m.size < k => m(t) = 1L
        case None => // decrement-all step: every counter pays one
          m.mapValuesInPlace((_, c) => c - 1)
          m.filterInPlace((_, c) => c > 0)
      }
    }
    MgState(m.keys.toList, m.values.toList, seen)
  }

  /** (token) stream → per-cell MG summaries. `buckets` shards the
    * state; `k` caps counters per cell (threshold = cellN/k). */
  def run(spark: SparkSession, tokens: DataFrame, buckets: Int,
      k: Int): Dataset[Summary] = {
    import spark.implicits._
    tokens
      .select(pmod(xxhash64(col("token")), lit(buckets)).cast("int")
        .as("bucket"), col("token"))
      .as[Tok]
      .groupByKey(_.bucket)
      .transformWithState(new Processor(k), TimeMode.None(),
        OutputMode.Update())
  }
}
