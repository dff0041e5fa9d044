package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
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

  test("left-outer stream-stream join emits unmatched yes rows with " +
    "nulls after watermark eviction") {
    val in = Files.createTempDirectory("graft-ssjo-in")
    val ck = Files.createTempDirectory("graft-ssjo-ck")
    // the file source orders batches by mtime: pin strictly increasing
    // stamps, or same-millisecond writes under suite load can put a
    // sentinel batch BEFORE the probe — after which no later batch
    // ever evicts it
    def stamp(p: java.nio.file.Path, i: Int): Unit =
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    Fixtures.ndjsonLines.grouped(20).zipWithIndex.foreach { case (g, i) =>
      stamp(Files.write(in.resolve(f"part-$i%02d.ndjson"), g.asJava), i)
    }
    // an isolated late yes delta with no no-side row within ±5 s — the
    // unmatched probe the outer join exists to surface — then sentinel
    // files whose only job is to push the watermark past its join
    // window in later micro-batches. The query watermark is the MIN
    // across BOTH join inputs, so each sentinel file advances yes AND
    // no sides, on two distinct never-matching tickers (the sentinels'
    // own unmatched rows may stay in state; they are excluded below)
    def late(side: String, ticker: String, seq: Long, offsetMs: Long) =
      Fixtures.envelopeJson(Right(Fixtures.Delta(1L, seq, ticker,
        Fixtures.baseTs + offsetMs, s"${Fixtures.baseTs + offsetMs}-0",
        side, 42, 3)))
    stamp(Files.write(in.resolve("part-90.ndjson"),
      Seq(late("yes", "KXTEST-A", 100L, 10000000L)).asJava), 90)
    stamp(Files.write(in.resolve("part-91.ndjson"),
      Seq(late("yes", "KXTEST-Y", 101L, 20000000L),
          late("no", "KXTEST-Z", 201L, 20000000L)).asJava), 91)
    stamp(Files.write(in.resolve("part-92.ndjson"),
      Seq(late("yes", "KXTEST-Y", 102L, 30000000L),
          late("no", "KXTEST-Z", 202L, 30000000L)).asJava), 92)
    val q = StreamJoins.yesNoPairsOuter(
        StreamPipeline.readMessages(spark, in.toString, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("yes_no_outer")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("yes_no_outer").collect()
      .filter(_.getLong(1) < 101L) // sentinel rows may be withheld
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // batch twin over the same lines (sentinels excluded the same way):
    // batch left-join needs no watermark to prove a non-match
    val batch = StreamJoins.yesNoPairsOuter(
        StreamPipeline.parseMessages(spark,
          Fixtures.ndjsonLines :+ late("yes", "KXTEST-A", 100L, 10000000L)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(streamed === batch)
    // the unmatched probe came out with a null no-side
    assert(streamed.contains(("KXTEST-A", 100L, -1L)))
    // and matched pairs still emitted with inner semantics
    assert(streamed.exists(_._3 >= 0L))
  }

  test("bucketed interval-join boundary semantics: exact ±band matches, " +
    "band+1ms does not, pre-1970 floor buckets link across negatives") {
    import spark.implicits._
    // rows chosen to sit EXACTLY on the edges the time-bucketed
    // equi-key could get wrong: the ±band boundary itself (inclusive),
    // 1 ms past it (exclusive), bucket-aligned timestamps, and
    // pre-1970 epochs where a truncating (non-floor) bucket division
    // would shift the no-side copies one bucket over and silently
    // drop boundary pairs
    val rows = Seq(
      ("yes", 1L, 0L), // on a bucket boundary
      ("no", 101L, 5000L), // +band edge -> match
      ("no", 102L, -5000L), // -band edge -> match (crosses epoch 0)
      ("no", 103L, 5001L), // +band+1ms -> no match
      ("no", 104L, -5001L), // no match
      ("yes", 2L, -7500L), // pre-1970, mid-bucket
      ("no", 105L, -2500L), // diff +5000 -> match
      ("no", 106L, -12500L), // diff -5000 -> match
      ("no", 107L, -12501L), // no match
      ("yes", 3L, 100000L)) // no no-side row in band: outer-only probe
    val msgs = rows.toDF("side", "seq", "ts")
      .select(lit("orderbook_delta").as("type"), col("seq"),
        struct(lit("KXB").as("market_ticker"), col("side"),
          col("ts"), lit(1).as("price"), lit(1).as("delta")).as("msg"))
    val got = StreamJoins.yesNoPairs(msgs) // default ±5 s band
      .select(col("yes_seq"), col("no_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference over the same rows
    val want = (for {
      (ys, yseq, yts) <- rows if ys == "yes"
      (ns, nseq, nts) <- rows if ns == "no"
      if math.abs(nts - yts) <= 5000L
    } yield (yseq, nseq)).toSet
    assert(got === want)
    // the two yes probes sit 7.5 s apart, so their bands overlap and
    // several no rows match BOTH — the cross-matches are the point
    // (a bucket-key bug that only preserved each row's own-bucket
    // neighbors would drop them)
    assert(want === Set((1L, 101L), (1L, 102L), (1L, 105L),
      (2L, 102L), (2L, 104L), (2L, 105L), (2L, 106L)))
    // and the left-outer twin keeps matched pairs AND emits the
    // band-isolated yes probe exactly once with a null no side
    val outer = StreamJoins.yesNoPairsOuter(msgs)
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(outer === want + ((3L, -1L)))
  }

  test("interval-join state is watermark-bounded: batches 10 min apart " +
    "evict under the production 1-minute watermark instead of accumulating") {
    val in = Files.createTempDirectory("graft-ssjs-in")
    val ck = Files.createTempDirectory("graft-ssjs-ck")
    def stamp(p: java.nio.file.Path, i: Int): Unit =
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    def delta(side: String, seq: Long, ts: Long) =
      Fixtures.envelopeJson(Right(Fixtures.Delta(1L, seq, "KXTEST-Y",
        ts, s"$ts-$seq", side, 42, 3)))
    val perBatch = 20
    (0 until 3).foreach { b =>
      val t0 = Fixtures.baseTs + b * 600000L // batches 10 min apart
      val lines = (0 until perBatch / 2).flatMap { j =>
        Seq(delta("yes", b * 100L + j, t0 + j * 100L),
          delta("no", b * 100L + 50 + j, t0 + j * 100L + 50L))
      }
      stamp(Files.write(in.resolve(f"part-$b%02d.ndjson"), lines.asJava), b)
    }
    val q = StreamJoins.yesNoPairs( // production default: 1-minute watermark
        StreamPipeline.readMessages(spark, in.toString, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("ssj_state_bound")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val stateRows = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
    assert(stateRows.nonEmpty)
    // every row passes THROUGH join state (a batch contributes
    // perBatch/2 yes rows + 3·perBatch/2 no-side bucket copies =
    // 2·perBatch state rows), but the watermark evicts each
    // 10-minutes-older batch as the next one commits — state never
    // holds the whole corpus (the production bound is watermark
    // delay + band of feed, constant in stream length; the st08/st09
    // gates' corpus-spanning WmDays watermark is the deliberate
    // replay-harness exception, see StreamJoins scaladoc)
    val perBatchState = 2L * perBatch
    assert(stateRows.max <= 2L * perBatchState,
      s"join state grew past two batches' worth: $stateRows")
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
