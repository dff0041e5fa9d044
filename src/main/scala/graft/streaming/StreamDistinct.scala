package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming DISTINCT-COUNT with BOUNDED state: a per-key KMV
  * (k-minimum-values) sketch maintained incrementally in
  * `transformWithState` — the streaming twin of txt15's batch KMV and
  * q63's bitmap route, for the regime neither handles: an unbounded
  * stream where exact per-key distinct state (a growing hash set)
  * would be the thing that OOMs the state store.
  *
  * Per key the state is the K smallest distinct element hashes —
  * fixed O(K) bytes per live key forever, any element universe. The
  * estimator is txt15's exactly: an under-filled sketch (fewer than K
  * distinct hashes ever seen) IS the exact count; at saturation,
  * (K−1)·M / h_K with relative error ≈ 1/√(K−2). Merging a batch is
  * "insert distinct hashes, keep the K smallest" — the same
  * order-insensitive fold that makes KMV mergeable map-side in batch.
  *
  * The demo keys by ticker and counts distinct PRICE LEVELS ever
  * quoted (book breadth — how much of the price grid a market has
  * actually touched), but the processor is generic over any
  * (key, element-hash) stream.
  */
object StreamDistinct {

  val K = 64
  val M = 1000000007L

  final case class Elem(ticker: String, h: Long)

  final case class Card(ticker: String, k_used: Int, est: Double)

  final case class Sketch(hs: Array[Long])

  class Processor extends StatefulProcessor[String, Elem, Card] {
    @transient private var state: ValueState[Sketch] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Sketch]("kmv",
        Encoders.product[Sketch], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Elem],
        tv: TimerValues): Iterator[Card] = {
      val prev: Array[Long] =
        if (state.exists()) state.get().hs else Array.empty[Long]
      // merge = distinct union, keep K smallest — order-insensitive
      val merged = (prev.iterator ++ rows.map(_.h))
        .foldLeft(scala.collection.immutable.SortedSet.empty[Long]) {
          (acc, h) =>
            val a = acc + h
            if (a.size > K) a - a.last else a
        }
      if (merged.isEmpty) Iterator.empty
      else {
        state.update(Sketch(merged.toArray))
        val kUsed = merged.size
        val est =
          if (kUsed < K) kUsed.toDouble
          else (kUsed - 1).toDouble * M / merged.last
        Iterator(Card(key, kUsed, est))
      }
    }
  }

  /** Generic (key, hash) stream → per-key cardinality stream — the
    * one state hop, shared by the wire path below and the st02
    * registry replay ([[StreamedQueries]]). */
  def runOn(spark: SparkSession, elems: Dataset[Elem]): Dataset[Card] = {
    import spark.implicits._
    elems.groupByKey(_.ticker)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Wire messages → per-ticker distinct-price-level cardinality
    * stream. The element hash is the txt15 Knuth-multiplier spread so
    * small integer price grids still fill [0, M) uniformly. */
  def run(spark: SparkSession, messages: DataFrame): Dataset[Card] = {
    import spark.implicits._
    runOn(spark, messages.where(col("type") === "orderbook_delta")
      .select(col("msg.market_ticker").as("ticker"),
        ((col("msg.price").cast("long") * 2654435761L + 678L) % M)
          .as("h"))
      .as[Elem])
  }
}
