package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The OTHER half of the skew story next to op01/op02's manual salting:
  * AQE's runtime skew-join split. Salting is the plan-level fix you
  * write when you KNOW the hot key; AQE is the safety net for the hot
  * key you didn't predict — it measures the actual shuffle-partition
  * sizes of a sort-merge join at stage boundary and splits oversized
  * partitions into parallel sub-reads, no query change. This spec pins
  * that the feature actually engages on a skewed join (thresholds
  * lowered to local-data scale; the assertion is on the ADAPTIVE final
  * plan, which only exists after execution). */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  test("AQE marks and splits a skewed sort-merge-join partition at runtime") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      import spark.implicits._
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // local-scale thresholds so a ~3 MB hot partition reads as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // 100k fact rows, HALF of them on one key: after the shuffle, key
      // 0's partition dwarfs every other by far more than factor 2
      val fact = spark.range(0, 100000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id").as("k"),
          lpad($"id".cast("string"), 64, "0").as("pad"))
      val dim = spark.range(0, 1000)
        .select($"id".as("k"), ($"id" * 7).as("v"))
      // NOTE: no aggregation on k downstream — a consumer that REQUIRES
      // hashpartitioning(k) vetoes the skew split (splitting the hot
      // partition would break the clustering guarantee); that veto is
      // itself part of the semantics this spec documents
      // keep pad in the OUTPUT too — column pruning would otherwise
      // strip it from the shuffle and deflate the hot partition below
      // the (compressed) skew threshold
      val joined = fact.join(dim, "k").select($"k", $"pad")
      val rows = joined.collect() // materialize → AQE final plan exists
      // k=0 matched 50k times; odd ids < 1000 matched once each
      assert(rows.count(_.getLong(0) == 0L) === 50000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
