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
}
