package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A3, streaming twin: per-subscription sequence-continuity validation
  * with explicit state (kalshi_ws_client.py:129-146).
  *
  * The reference fail-stops on the first gap; here gaps are emitted as
  * data (like the batch `Normalize.seqGapFlags`) so the B7 monitoring
  * queries can count them and the stream keeps running — Spark task
  * retry makes fail-stop the wrong recovery model.
  *
  * State is one Long per `sid` (the subscription id) — bounded by the
  * number of live subscriptions (≤1000 markets, kalshi_rest_client.py:62),
  * so the state store stays trivially small at any data scale.
  */
object SeqValidator {

  final case class SeqMsg(sid: Long, seq: Long, ticker: String)
  final case class SeqGap(sid: Long, ticker: String,
      expected_seq: Long, seq: Long)

  /** Messages within a micro-batch arrive unordered; sort each group by
    * seq before checking continuity (the per-key total order the
    * reference gets for free from the single socket). */
  def validate(sid: Long, msgs: Iterator[SeqMsg],
      state: GroupState[Long]): Iterator[SeqGap] = {
    val sorted = msgs.toSeq.sortBy(_.seq)
    var expected = state.getOption.getOrElse(-1L)
    val gaps = Seq.newBuilder[SeqGap]
    sorted.foreach { m =>
      if (expected >= 0 && m.seq != expected)
        gaps += SeqGap(sid, m.ticker, expected, m.seq)
      expected = m.seq + 1
    }
    if (expected >= 0) state.update(expected)
    gaps.result().iterator
  }

  /** Works on both streaming and batch Datasets (state starts empty in
    * batch). Input: any frame with sid/seq/ticker columns — e.g.
    * [[StreamPipeline.readMessages]] output with
    * `ticker = msg.market_ticker`. */
  def gaps(spark: SparkSession, messages: DataFrame): Dataset[SeqGap] = {
    import spark.implicits._
    messages
      .select(col("sid").cast("long"), col("seq").cast("long"),
        col("ticker").cast("string"))
      .as[SeqMsg]
      .groupByKey(_.sid)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(validate)
  }
}
