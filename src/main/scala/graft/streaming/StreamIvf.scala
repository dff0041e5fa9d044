package graft.streaming

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming IVF ingest: nearest-centroid CELL ASSIGNMENT at
  * embedding-ingest time + INCREMENTAL per-cell centroid statistics in
  * `transformWithState` — the streaming counterpart of sim10's batch
  * Lloyd step (round-9 verdict item 6), for the regime the batch stack
  * doesn't cover: vectors arriving continuously, where the index must
  * absorb them into cells NOW and the codebook refresh wants running
  * member stats without rescanning history.
  *
  * Parity contract with the batch twin (pinned in StreamIvfSpec and
  * the st01 oracle): after the whole corpus has streamed through — in
  * ANY micro-batch partitioning — the final per-cell stats equal
  * sim10's hash-aggregate exactly:
  *  - assignment is the same argmin: minimal (−cosine, pid) per
  *    vector against the same broadcast-scale codebook (primitive
  *    double compares, so −0.0 ≡ 0.0 like Spark's struct ordering);
  *  - component sums accumulate in EXACT integer micros — each
  *    component quantized to DECIMAL-scale-6 by the same
  *    string-path HALF_UP rounding Spark's `cast(v as decimal(28,6))`
  *    uses — so the fold is order-insensitive across batches and
  *    state merges, exactly why sim10's batch partials are safe;
  *  - the final mean divides once, in double, from the exact decimal
  *    (`BigDecimal(sum, 6).doubleValue / n` ≡ `cast(sum as double) /
  *    count`).
  *
  * State per live cell: one (n, sums[dims]) row — O(cells · dims)
  * total regardless of stream length, the bounded-state discipline of
  * StreamDistinct/StreamHeavyHitters. Emissions are per-batch running
  * stats (Update mode); n is strictly monotone per cell across its
  * emissions, so "latest" is selectable deterministically downstream.
  */
object StreamIvf {

  /** One ingested vector: pre-assigned cell + micros-quantized
    * components (the quantization happens stream-side, before the
    * shuffle to cell-keyed state). */
  final case class CellVec(cell: Long, v6: Array[Long])

  /** Running stats emission: member count + per-dim mean. */
  final case class CellStats(cell: Long, n_members: Long,
      means: Array[Double])

  // NOT private: the state encoder's GENERATED code calls the accessors
  // reflectively-by-name from a Janino class outside this scope — on a
  // private class that compile fails and every state (de)serialization
  // silently falls back to the interpreted projection path (observed as
  // "Expr codegen error and falling back to interpreter mode" WARNs in
  // the st01 state shuffle).
  final case class Acc(n: Long, sums: Array[Long])

  /** Spark's `cast(double as decimal(_,6))` exactly: string-path
    * BigDecimal (valueOf) + HALF_UP at scale 6, as unscaled micros. */
  def micros6(v: Double): Long =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** `cast(sumDecimal(38,6) as double) / n` exactly. */
  def meanOf(sumMicros: Long, n: Long): Double =
    new JBigDecimal(BigInteger.valueOf(sumMicros), 6).doubleValue() / n

  /** sim10's assignment argmin for one vector: minimal (−cos, pid)
    * over the codebook, PRIMITIVE double compares (−0.0 ≡ 0.0, NaN
    * impossible — zero-norm vectors are excluded upstream). */
  def assign(e: Array[Double], nrm: Double,
      cents: Array[(Long, Array[Double], Double)]): Long = {
    var bestNc = Double.MaxValue
    var bestPid = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      val (pid, ce, cnrm) = cents(i)
      var dot = 0.0
      var j = 0
      while (j < e.length) { dot += e(j) * ce(j); j += 1 }
      val nc = -(dot / (nrm * cnrm))
      if (nc < bestNc || (!(nc > bestNc) && pid < bestPid)) {
        bestNc = nc; bestPid = pid
      }
      i += 1
    }
    bestPid
  }

  class Processor extends StatefulProcessor[Long, CellVec, CellStats] {
    @transient private var state: ValueState[Acc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Acc]("ivf",
        Encoders.product[Acc], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CellVec],
        tv: TimerValues): Iterator[CellStats] = {
      val prev = if (state.exists()) state.get() else Acc(0L, null)
      var n = prev.n
      var sums = prev.sums
      rows.foreach { r =>
        if (sums == null) sums = new Array[Long](r.v6.length)
        var j = 0
        while (j < r.v6.length) { sums(j) += r.v6(j); j += 1 }
        n += 1
      }
      if (n == prev.n) Iterator.empty // no rows actually consumed
      else {
        state.update(Acc(n, sums))
        Iterator(CellStats(key, n, sums.map(meanOf(_, n))))
      }
    }
  }

  /** (cell, v6) stream → running per-cell stats. Callers do the
    * assignment + quantization stream-side (see
    * [[graft.streaming.StreamedQueries]]) so this hop is exactly one
    * cell-keyed state shuffle. */
  def runOn(spark: SparkSession, vecs: Dataset[CellVec])
      : Dataset[CellStats] = {
    import spark.implicits._
    vecs.groupByKey(_.cell)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update())
  }
}
