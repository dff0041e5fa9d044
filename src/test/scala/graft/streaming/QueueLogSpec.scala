package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.Fixtures

/** The durable-queue seam: producer and consumer in separate crash
  * domains. The core claim is the restart contract — a query stopped
  * and RESTARTED from its checkpoint, with the producer appending in
  * between, delivers every message exactly once to an exactly-once
  * sink (parquet + checkpoint WAL). */
class QueueLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("append is atomic-per-segment, ids are monotone, trim retains " +
    "the committed segment") {
    val dir = tmp("qlog-unit")
    assert(QueueLog.append(dir, Seq("a", "b")) === 0L)
    assert(QueueLog.append(dir, Seq("c")) === 1L)
    assert(QueueLog.append(dir, Seq("d")) === 2L)
    assert(QueueLog.segments(dir).map(_._1) === Seq(0L, 1L, 2L))
    QueueLog.trim(dir, QueueOffset(2L, 0L))
    assert(QueueLog.segments(dir).map(_._1) === Seq(2L))
    // a fresh consumer on the trimmed queue starts at the earliest
    // retained segment, not id 0
    val stream = new QueueLogStream(dir, Long.MaxValue)
    assert(stream.initialOffset() === QueueOffset(2L, 0L))
  }

  test("a full-drain trim keeps the newest segment so append ids stay " +
    "monotone and the checkpointed consumer keeps receiving") {
    val dir = tmp("qlog-drain")
    (0 until 3).foreach(i => QueueLog.append(dir, Seq(s"""{"n":$i}""")))
    // consumer fully drained: committed offset is (3, 0)
    QueueLog.trim(dir, QueueOffset(3L, 0L))
    // the id high-water mark survives...
    assert(QueueLog.segments(dir).map(_._1) === Seq(2L))
    // ...so the next append does NOT restart at 0
    assert(QueueLog.append(dir, Seq("""{"n":3}""")) === 3L)
    // and the drained consumer still sees it
    val stream = new QueueLogStream(dir, Long.MaxValue)
    val next = stream.latestOffset(QueueOffset(3L, 0L),
      stream.getDefaultReadLimit)
    assert(next === QueueOffset(4L, 0L))
  }

  test("offset json round-trips") {
    val o = QueueOffset(7L, 13L)
    assert(QueueOffset.parse(o.json()) === o)
  }

  test("restarted query resumes from the checkpoint: no loss, no dupes, " +
    "while the producer appends between runs") {
    val dir = tmp("qlog-e2e")
    val ckpt = tmp("qlog-ckpt")
    val sink = tmp("qlog-sink") + "/out"

    val all = Fixtures.genMessages(Seq("KXQ-A", "KXQ-B"), 30)
      .map(Fixtures.envelopeJson)
    val (first, second) = all.splitAt(18)

    // producer epoch 1: two segments
    QueueLog.append(dir, first.take(10))
    QueueLog.append(dir, first.drop(10))

    def runOnce(): Unit = {
      val src = new Connectors.QueueMessageSource(dir)
      val q = src.messages(spark)
        .select(col("raw"))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop() // consumer crash domain: stop ≙ kill
    }

    runOnce()
    assert(spark.read.parquet(sink).count() === first.size.toLong)

    // producer epoch 2 (independent of the consumer's lifecycle)
    QueueLog.append(dir, second)

    runOnce()
    val out = spark.read.parquet(sink)
    assert(out.count() === all.size.toLong, "loss or duplication across restart")
    assert(out.select(col("raw")).distinct().count() === all.size.toLong)
  }

  test("maxSegmentsPerTrigger bounds each batch without losing the " +
    "remainder") {
    val dir = tmp("qlog-adm")
    (0 until 5).foreach(i => QueueLog.append(dir, Seq(s"""{"n":$i}""")))
    val stream = new QueueLogStream(dir, 2L)
    var off = stream.initialOffset().asInstanceOf[QueueOffset]
    var batches = 0
    var rows = 0
    while ({
      val next = stream.latestOffset(off, stream.getDefaultReadLimit)
        .asInstanceOf[QueueOffset]
      if (next != off) {
        val parts = stream.planInputPartitions(off, next)
        assert(parts.length <= 2)
        rows += parts.map(p =>
          QueueLog.readLines(java.nio.file.Paths.get(
            p.asInstanceOf[QueueSegmentPartition].path)).length).sum
        off = next
        batches += 1
        true
      } else false
    }) ()
    assert(batches === 3) // 2 + 2 + 1
    assert(rows === 5)
  }

  test("Trigger.AvailableNow + maxSegmentsPerTrigger drains the WHOLE " +
    "log in capped batches, then terminates (round-12 st15 regression)") {
    val dir = tmp("qlog-avnow")
    val lines = (0 until 9).map(i =>
      s"""{"type":"t","sid":1,"seq":${i + 1},"msg":{"n":$i}}""")
    lines.grouped(3).foreach(g => QueueLog.append(dir, g.toSeq))
    val q = spark.readStream.format("graft-queue")
      .option("path", dir).option("maxSegmentsPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("qlog_avnow")
      .outputMode("append")
      .option("checkpointLocation", tmp("qlog-avnow-ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // without SupportsTriggerAvailableNow, the run's end froze at the
    // FIRST latestOffset answer — one capped batch, 3 of 9 rows
    assert(spark.table("qlog_avnow").count() === 9L)
    // and the cap really bounded each batch: 3 segments → 3 batches
    val committed = q.recentProgress.count(_.numInputRows > 0)
    assert(committed === 3, s"expected 3 capped batches, saw $committed")
  }

  /** Drain one planned partition through the real executor-side reader. */
  private def readPartition(p: QueueSegmentPartition): Seq[String] = {
    val r = QueueSegmentReaderFactory.createReader(p)
    try {
      val out = Seq.newBuilder[String]
      while (r.next()) out += r.get().getUTF8String(0).toString
      out.result()
    } finally r.close()
  }

  test("a mid-segment checkpoint (line > 0) resumes at exactly the next " +
    "unconsumed line") {
    val dir = tmp("qlog-midseg")
    QueueLog.append(dir, Seq("a0", "a1", "a2", "a3"))
    QueueLog.append(dir, Seq("b0", "b1"))
    val stream = new QueueLogStream(dir, Long.MaxValue)
    // a checkpoint that stopped 2 lines into segment 0
    val parts = stream.planInputPartitions(
      QueueOffset(0L, 2L), QueueOffset(2L, 0L))
    assert(parts.length === 2)
    val rows = parts.toSeq
      .map(_.asInstanceOf[QueueSegmentPartition]).flatMap(readPartition)
    assert(rows === Seq("a2", "a3", "b0", "b1"))
    // skipping the whole segment is a clean empty partition, not an error
    val whole = stream.planInputPartitions(
      QueueOffset(0L, 4L), QueueOffset(1L, 0L))
    assert(whole.toSeq.map(_.asInstanceOf[QueueSegmentPartition])
      .flatMap(readPartition) === Seq.empty)
  }

  test("a trim concurrent with an active batch never touches the " +
    "batch's segments") {
    val dir = tmp("qlog-trimrace")
    (0 until 4).foreach(i => QueueLog.append(dir, Seq(s"""{"n":$i}""")))
    val stream = new QueueLogStream(dir, Long.MaxValue)
    // consumer committed through segment 1 and is mid-batch on [1, 4)
    val parts = stream.planInputPartitions(
      QueueOffset(1L, 0L), QueueOffset(4L, 0L))
    // retention fires concurrently, up to the consumer's COMMITTED
    // offset (the only trim a correct operator issues)
    QueueLog.trim(dir, QueueOffset(1L, 0L))
    assert(QueueLog.segments(dir).map(_._1) === Seq(1L, 2L, 3L))
    // the in-flight batch still reads every planned row
    val rows = parts.toSeq
      .map(_.asInstanceOf[QueueSegmentPartition]).flatMap(readPartition)
    assert(rows === Seq("""{"n":1}""", """{"n":2}""", """{"n":3}"""))
    // and the next batch plans cleanly from the same frontier
    val next = stream.latestOffset(QueueOffset(4L, 0L),
      stream.getDefaultReadLimit)
    assert(next === QueueOffset(4L, 0L)) // nothing new — no phantom data
  }

  test("skipLines survives past 2^31 without truncation; negatives are " +
    "rejected") {
    val dir = tmp("qlog-skip")
    QueueLog.append(dir, Seq("x0", "x1"))
    val seg = QueueLog.segments(dir).head._2.toString
    // > Int.MaxValue: the old .toInt truncation would turn this into a
    // small positive skip and re-deliver rows; the streaming reader
    // skips lines until the file ends — an empty partition
    val huge = QueueSegmentPartition(seg, Int.MaxValue.toLong + 5L)
    assert(readPartition(huge) === Seq.empty)
    val e = intercept[IllegalArgumentException] {
      QueueSegmentReaderFactory.createReader(
        QueueSegmentPartition(seg, -1L))
    }
    assert(e.getMessage.contains("negative skipLines"))
  }

  test("a trim past the checkpoint fails the restart loudly instead of " +
    "skipping data") {
    val dir = tmp("qlog-trimfail")
    (0 until 3).foreach(i => QueueLog.append(dir, Seq(s"""{"n":$i}""")))
    val stream = new QueueLogStream(dir, Long.MaxValue)
    // checkpointed state says "consumed nothing"; segment 0 vanishes
    QueueLog.trim(dir, QueueOffset(1L, 0L))
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(QueueOffset(0L, 0L), QueueOffset(3L, 0L))
    }
    assert(e.getMessage.contains("trimmed past the checkpoint"))
  }
}
