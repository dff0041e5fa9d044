package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming Misra–Gries summary must honor the batch guarantee
  * across micro-batch boundaries: every token whose true count exceeds
  * its cell's stream length / K survives in the final summary, with a
  * counter that lower-bounds the true count by at most cellN/K. */
class StreamHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private val K = 8
  private val Buckets = 4

  test("tokens heavier than cellN/K survive the stream summary; " +
    "counters are within-cellN/K lower bounds") {
    val in = Files.createTempDirectory("graft-hh-in")
    val out = Files.createTempDirectory("graft-hh-out")
    in.toFile.deleteOnExit(); out.toFile.deleteOnExit()
    // a skewed synthetic stream: two heavy tokens buried in a long
    // tail — split into three files so the summary must survive two
    // state-store round trips
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta")
    val tail = (0 until 600).map(i => s"t${i % 200}")
    val all = new scala.util.Random(7).shuffle(heavy ++ tail)
    all.grouped((all.size + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      val f = in.resolve(s"$i.txt")
      Files.write(f, chunk.asJava)
      f.toFile.setLastModified(System.currentTimeMillis() - (10 - i) * 60000)
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val tokens = spark.readStream.format("text")
      .option("maxFilesPerTrigger", 1).load(in.toString)
      .select(col("value").as("token"))
    val q = StreamHeavyHitters.run(spark, tokens, Buckets, K)
      .writeStream
      .format("memory").queryName("hh").outputMode("update")
      .option("checkpointLocation", s"$out/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // latest snapshot per cell = ONLY the rows emitted at that cell's
    // max seen counter (a per-token latest would resurrect tokens the
    // decrement step evicted in a later batch)
    val finals = spark.table("hh")
      .withColumn("max_seen", max(col("cell_seen")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))))
      .where(col("cell_seen") === col("max_seen"))
      .collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[String]("token")) ->
        (r.getAs[Long]("lower_bound"), r.getAs[Long]("cell_seen")))
      .toMap
    // ground truth, bucketed exactly as the stream buckets
    val bucketOf = spark.range(1).sparkSession.createDataFrame(
        all.map(Tuple1(_))).toDF("token")
      .select(col("token"),
        pmod(xxhash64(col("token")), lit(Buckets)).cast("int").as("bucket"))
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Int]("bucket"))
    val cellN = bucketOf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val trueCount = bucketOf.groupBy(identity).view.mapValues(_.size.toLong)
    trueCount.foreach { case ((token, bucket), n) =>
      val threshold = cellN(bucket).toDouble / K
      if (n > threshold) {
        val got = finals.get((bucket, token))
        assert(got.isDefined,
          s"heavy token $token (count $n > $threshold in cell $bucket) " +
            "missing from the summary")
        val (lb, _) = got.get
        assert(lb <= n && lb >= n - cellN(bucket) / K,
          s"$token counter $lb outside [n - cellN/K, n] = " +
            s"[${n - cellN(bucket) / K}, $n]")
      }
    }
    // the state cap held: no cell ever reports more than K tokens
    finals.keys.groupBy(_._1).foreach { case (b, ks) =>
      assert(ks.size <= K, s"cell $b holds ${ks.size} > K=$K tokens")
    }
    // TestSpark's session is shared across suites — restore the
    // default state-store provider
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
