package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.Fixtures

/** Bounded-state streaming distinct count: the per-key KMV sketch must
  * (a) carry across micro-batches, (b) be EXACT while under-filled,
  * (c) estimate within the KMV error envelope at saturation, and
  * (d) never hold more than K hashes per key. */
class StreamDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  test("per-ticker KMV distinct folds across micro-batches") {
    val in = Files.createTempDirectory("graft-sdc-in")
    val out = Files.createTempDirectory("graft-sdc-out")
    in.toFile.deleteOnExit(); out.toFile.deleteOnExit()
    val (a, b) = Fixtures.ndjsonLines.splitAt(Fixtures.ndjsonLines.size / 2)
    Files.write(in.resolve("a.ndjson"), a.asJava)
    Files.write(in.resolve("b.ndjson"), b.asJava)
    in.resolve("a.ndjson").toFile.setLastModified(
      System.currentTimeMillis() - 60000)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamDistinct.run(spark,
          StreamPipeline.readMessages(spark, in.toString,
            maxFilesPerTrigger = 1))
        .writeStream
        .format("memory").queryName("stream_distinct")
        .outputMode("update")
        .option("checkpointLocation", s"$out/_ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // last emitted row per ticker = final sketch verdict. k_used alone
      // can tie across micro-batches (saturated sketch whose h_K keeps
      // shrinking, or a batch adding no new hashes) and row_number would
      // then pick an arbitrary batch — est is monotone non-decreasing at
      // fixed k_used, so (k_used DESC, est DESC) IS the final emission
      val finals = spark.table("stream_distinct")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("ticker"))
            .orderBy(col("k_used").desc, col("est").desc)))
        .where(col("rn") === 1)
        .collect()
        .map(r => r.getAs[String]("ticker") ->
          (r.getAs[Int]("k_used"), r.getAs[Double]("est"))).toMap
      val exact = Fixtures.deltas.groupBy(_.ticker)
        .view.mapValues(_.map(_.priceCents).distinct.size).toMap
      assert(finals.keySet === exact.keySet)
      exact.foreach { case (t, n) =>
        val (kUsed, est) = finals(t)
        assert(kUsed <= StreamDistinct.K, s"$t state over K")
        if (n < StreamDistinct.K)
          // under-filled: the sketch IS the exact count
          assert(kUsed === n && est === n.toDouble,
            s"$t under-filled sketch not exact: k=$kUsed est=$est n=$n")
        else
          // saturated: KMV stderr ~ 1/sqrt(K-2) ≈ 13% — allow 4 sigma
          assert(math.abs(est - n) / n < 0.5,
            s"$t estimate $est too far from exact $n")
      }
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
