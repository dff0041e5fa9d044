package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Bounded-state replay dedup for UNBOUNDED retention — the scale
  * complement to `dropDuplicatesWithinWatermark` (A15's exact twin):
  * exact dedup state grows with the retention window, so "suppress a
  * replay from any point in history" (the reference's restart-from-0
  * failure mode, consumer.py:128) cannot be exact at 100 TB. The
  * standard answer is a per-key Bloom filter: fixed bytes per key,
  * false-positive rate ~(1-e^(-kn/m))^k, zero false negatives — a
  * duplicate is ALWAYS suppressed; the price is a tunable sliver of
  * fresh messages misread as duplicates, never data corruption.
  *
  * State is ONE fixed-size byte array per ticker (m bits + the insert
  * count), keyed and checkpointed exactly like every other stateful
  * operator — O(live tickers × m/8) bytes total, independent of
  * message history. Hashing is double-hashing (h1 + i·h2, the
  * Kirsch–Mitzenmacher construction) over the message's lineage id, so
  * the k probe positions come from two 64-bit FNV-1a passes.
  */
object BloomDedup {

  final case class Msg(ticker: String, lineageId: String, seq: Long,
      payload: String)

  /** m bits (power of two), k probes. 2^16 bits = 8 KiB per ticker
    * holds ~6,500 ids at 1% fpp; production sizes m from the expected
    * per-key id volume per retention epoch. */
  final case class Config(mBits: Int = 1 << 16, k: Int = 4) {
    // probes masks with mBits-1 and the cell allocates mBits/8 bytes:
    // a non-power-of-two m would leave bits unreachable and silently
    // inflate the false-positive rate past the documented ~1%
    require(mBits >= 8 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 8, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
  }

  final case class BloomCell(bits: Array[Byte], inserted: Long)

  private def fnv1a(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Probe positions via double hashing; mask keeps them in [0, m). */
  private[streaming] def probes(id: String, mBits: Int, k: Int): Array[Int] = {
    val h1 = fnv1a(id, 0L)
    val h2 = fnv1a(id, 0x9e3779b97f4a7c15L) | 1L // odd → full-period step
    val mask = mBits - 1
    Array.tabulate(k)(i => ((h1 + i * h2) & Long.MaxValue).toInt & mask)
  }

  private def testAndSet(cell: Array[Byte], pos: Array[Int]): Boolean = {
    var seen = true
    var i = 0
    while (i < pos.length) {
      val byteIdx = pos(i) >>> 3
      val bit = (1 << (pos(i) & 7)).toByte
      if ((cell(byteIdx) & bit) == 0) {
        seen = false
        cell(byteIdx) = (cell(byteIdx) | bit).toByte
      }
      i += 1
    }
    seen
  }

  /** Emits only first-seen messages per ticker; a lineage id whose k
    * bits are all already set is dropped as a (possible) replay. */
  class Processor(cfg: Config)
      extends StatefulProcessor[String, Msg, Msg] {
    @transient private var state: ValueState[BloomCell] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BloomCell]("bloom",
        Encoders.product[BloomCell], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Msg],
        tv: TimerValues): Iterator[Msg] = {
      val cell =
        if (state.exists()) state.get()
        else BloomCell(new Array[Byte](cfg.mBits / 8), 0L)
      val bits = cell.bits.clone() // state rows must not alias emitted state
      var inserted = cell.inserted
      // deterministic intra-batch order: replays inside one batch dedup
      // the same way they would across batches
      val out = rows.toSeq.sortBy(m => (m.seq, m.lineageId)).flatMap { m =>
        val fresh = !testAndSet(bits, probes(m.lineageId, cfg.mBits, cfg.k))
        if (fresh) { inserted += 1; Some(m) } else None
      }
      state.update(BloomCell(bits, inserted))
      out.iterator
    }
  }

  /** Wire messages → replay-suppressed stream, one state shuffle on the
    * ticker; Update mode (emissions are per-arrival, not per-window). */
  def run(spark: SparkSession, messages: Dataset[Msg],
      cfg: Config = Config()): Dataset[Msg] = {
    import spark.implicits._
    messages
      .groupByKey(_.ticker)
      .transformWithState(new Processor(cfg), TimeMode.None(),
        OutputMode.Update())
  }

  /** DataFrame adapter from the StreamPipeline message shape
    * (`redis_stream_id` is the lineage key A15 dedups on; keyless rows
    * — acks, malformed lines — are not replays and pass through the
    * pipeline's dead-letter path instead, mirroring
    * [[StreamPipeline.dedupAcrossBatches]]). */
  def fromMessages(spark: SparkSession, messages: DataFrame): Dataset[Msg] = {
    import spark.implicits._
    run(spark, messages
      .where(col("redis_stream_id").isNotNull)
      .select(col("msg.market_ticker").as("ticker"),
        col("redis_stream_id").as("lineageId"), col("seq"),
        col("raw").as("payload"))
      .as[Msg])
  }
}
