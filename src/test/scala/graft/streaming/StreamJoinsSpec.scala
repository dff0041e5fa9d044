package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.Fixtures

class StreamJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getLong(1), r.getLong(2))

  test("stream-stream interval join matches its batch twin exactly") {
    val in = Files.createTempDirectory("graft-ssj-in")
    val ck = Files.createTempDirectory("graft-ssj-ck")
    Fixtures.ndjsonLines.grouped(20).zipWithIndex.foreach { case (g, i) =>
      Files.write(in.resolve(f"part-$i%02d.ndjson"), g.asJava)
    }
    val q = StreamJoins.yesNoPairs(
        StreamPipeline.readMessages(spark, in.toString, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("yes_no_pairs")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("yes_no_pairs").collect().map(key).toSet
    val batch = StreamJoins.yesNoPairs(
        StreamPipeline.parseMessages(spark, Fixtures.ndjsonLines))
      .collect().map(key).toSet
    // inner interval-join matches emit as rows arrive (the watermark
    // only bounds state), so streaming output equals the batch join
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("stream-static enrichment broadcasts the dim, keeps unknown " +
    "tickers, and matches its batch twin") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sse-in")
    val ck = Files.createTempDirectory("graft-sse-ck")
    Fixtures.ndjsonLines.grouped(25).zipWithIndex.foreach { case (g, i) =>
      Files.write(in.resolve(f"part-$i%02d.ndjson"), g.asJava)
    }
    // dim covers only two of the three fixture tickers — the third must
    // survive the left join with a null series
    val dim = Seq(("KXTEST-A", "S1"), ("KXTEST-B", "S2"))
      .toDF("ticker", "series")
    val q = StreamJoins.enrichDeltas(
        StreamPipeline.readMessages(spark, in.toString, maxFilesPerTrigger = 1),
        dim)
      .writeStream.format("memory").queryName("enriched_deltas")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("enriched_deltas").collect()
    val batchDf = StreamJoins.enrichDeltas(
      StreamPipeline.parseMessages(spark, Fixtures.ndjsonLines), dim)
    val toKey = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(4), Option(r.getString(5)))
    assert(streamed.map(toKey).toSet === batchDf.collect().map(toKey).toSet)
    // the uncovered ticker's rows are present, with a null dimension
    assert(streamed.exists(r => r.getString(0) == "KXTEST-C" && r.isNullAt(5)))
    assert(streamed.exists(r => r.getString(0) == "KXTEST-A" &&
      r.getString(5) == "S1"))
    // the dim attach is a broadcast-hash probe, never a shuffle
    val p = batchDf.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"dim join is not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join shuffles:\n$p")
  }
}
