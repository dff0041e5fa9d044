package graft.orderbook

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ob11's exact-`percentile` aggregate buffers every distinct value per
  * group — safe ONLY while the latency domain stays O(1). This spec is
  * the tripwire: if a future edit derives latency from anything with
  * row-scaling cardinality (a real timestamp diff, say), the distinct
  * count explodes past the pinned bound and this fails before the
  * operator becomes an unbounded per-group buffer at scale. The 100 TB
  * spelling for unbounded domains is `approx_percentile` — see the
  * scaladoc on [[Analytics.latency]]. */
class LatencyBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("ob11 latency domain is O(1): exact-percentile state stays bounded") {
    val distinctLatencies = Derive.deltas(spark, dir)
      .select((col("event_id") % 7).as("latency"))
      .distinct()
      .count()
    // event_id % 7 ⇒ at most 7 distinct values, corpus-size-independent
    assert(distinctLatencies <= 7,
      s"ob11 latency cardinality $distinctLatencies breaks the bounded-" +
        "buffer invariant; switch the registered query to approx_percentile")
  }
}
