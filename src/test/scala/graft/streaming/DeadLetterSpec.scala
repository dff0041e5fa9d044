package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.{Fixtures, Normalize}

class DeadLetterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private val garbage = Seq(
    """not json at all""",
    """{"type":"ticker_update","sid":9,"seq":1,"msg":{}}""",
    """{"half": "an object",""")

  test("malformed and unknown messages route to dead letters, not sinks") {
    val msgs = StreamPipeline.parseMessages(spark,
      Fixtures.ndjsonLines ++ garbage)
    val dead = StreamPipeline.deadLetters(msgs)
    assert(dead.count() === garbage.size)
    assert(dead.where(col("msg_type") === "ticker_update").count() === 1)
    // the good branches see exactly the clean rows
    assert(StreamPipeline.routeDeltas(msgs).count() ===
      Fixtures.deltas.size)
    assert(StreamPipeline.routeSnapshots(msgs).count() ===
      Fixtures.snaps.size * 6)
    // raw lines survive for replay
    assert(dead.select("raw").collect().map(_.getString(0)).toSet ===
      garbage.toSet)
  }

  test("A6 serialize ∘ parse is identity on snapshot entries") {
    val parsed = Normalize.parseSnapshotEntries(
      Fixtures.snapshotEntries(spark))
    val roundtrip = Normalize.parseSnapshotEntries(
      Normalize.serializeSnapshotEntries(parsed))
    assert(parsed.exceptAll(roundtrip).count() === 0)
    assert(roundtrip.exceptAll(parsed).count() === 0)
  }
}
