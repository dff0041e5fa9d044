package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.Fixtures

/** transformWithState processor: replay the fixture stream in two
  * micro-batches and check the final per-ticker stats equal the batch
  * ground truth (state carried across batches, updates in seq order). */
class TickerStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  test("per-ticker stats fold across micro-batches with named state") {
    val in = Files.createTempDirectory("graft-tws-in")
    val out = Files.createTempDirectory("graft-tws-out")
    in.toFile.deleteOnExit(); out.toFile.deleteOnExit()
    // two files + maxFilesPerTrigger=1 → two micro-batches, so the
    // second batch MUST read the first's state back from the store
    val (a, b) = Fixtures.ndjsonLines.splitAt(Fixtures.ndjsonLines.size / 2)
    Files.write(in.resolve("a.ndjson"), a.asJava)
    Files.write(in.resolve("b.ndjson"), b.asJava)
    // the file source orders batches by modification time — pin it so
    // batch 1 is a.ndjson (the tie otherwise breaks arbitrarily)
    in.resolve("a.ndjson").toFile.setLastModified(
      System.currentTimeMillis() - 60000)
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = TickerStats.run(spark,
          StreamPipeline.readMessages(spark, in.toString, maxFilesPerTrigger = 1))
        .writeStream
        .format("memory").queryName("ticker_stats").outputMode("update")
        .option("checkpointLocation", s"$out/_ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // last emitted row per ticker = final state
      val finals = spark.table("ticker_stats")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("ticker")).orderBy(col("last_seq").desc)))
        .where(col("rn") === 1)
        .collect().map(r => r.getAs[String]("ticker") -> r).toMap
      val expected = Fixtures.deltas.groupBy(_.ticker)
      assert(finals.keySet === expected.keySet)
      expected.foreach { case (t, ds) =>
        val r = finals(t)
        assert(r.getAs[Long]("n_msgs") === ds.size.toLong, s"$t count")
        assert(r.getAs[Long]("last_seq") === ds.map(_.seq).max, s"$t seq")
        assert(r.getAs[Int]("min_price") === ds.map(_.priceCents).min)
        assert(r.getAs[Int]("max_price") === ds.map(_.priceCents).max)
        assert(r.getAs[Int]("last_price") ===
          ds.maxBy(_.seq).priceCents, s"$t last price")
      }
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
