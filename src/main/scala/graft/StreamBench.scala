package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.orderbook.Fixtures
import graft.streaming.StreamPipeline

/** Ingest-throughput benchmark: N wire messages replayed through the
  * FULL streaming pipeline (parse → route → explode/flatten → dedup →
  * parquet with checkpointing) — the apples-to-apples comparison with
  * the reference's drain ceiling of ≈1,000 msg/s per stream
  * (batch=100 per XRANGE, 0.1 s idle poll — BASELINE.md).
  *
  * `sbt "runMain graft.StreamBench [nMessages]"` → one JSON line.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(240000)
    val tickers = (0 until 100).map(i => f"KXBENCH-$i%03d")
    val lines = Fixtures.genMessages(tickers, n / tickers.size)
      .map(Fixtures.envelopeJson)

    val in = Files.createTempDirectory("graft-sbench-in")
    val out = Files.createTempDirectory("graft-sbench-out")
    // 24 files → several micro-batches at maxFilesPerTrigger's default
    val per = math.max(1, lines.size / 24)
    lines.grouped(per).zipWithIndex.foreach { case (g, i) =>
      Files.write(in.resolve(f"part-$i%03d.ndjson"), g.asJava)
    }

    val spark = GraftSession.local()
    // warm codegen/IO so the timed run measures steady-state throughput
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val t0 = System.nanoTime()
    StreamPipeline.runUnified(spark, in.toString, out.toString)
      .awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9

    val snapRows = spark.read.parquet(s"$out/orderbook_snapshots").count()
    val deltaRows = spark.read.parquet(s"$out/orderbook_deltas").count()
    val msgs = lines.size
    println(f"""{"metric":"stream_ingest","messages":$msgs,"sec":$sec%.2f,"msgs_per_sec":${msgs / sec}%.0f,"snapshot_rows":$snapRows,"delta_rows":$deltaRows}""")

    // Same pipeline fed from the durable graft-queue source (segment
    // log on disk, executor-side reads) — the buffered-deployment
    // number next to the file-replay one.
    val qdir = Files.createTempDirectory("graft-sbench-queue")
    val qout = Files.createTempDirectory("graft-sbench-qout")
    lines.grouped(per).foreach(g =>
      graft.streaming.QueueLog.append(qdir.toString, g))
    val t1 = System.nanoTime()
    StreamPipeline.runUnifiedFrom(
        new graft.streaming.Connectors.QueueMessageSource(qdir.toString)
          .messages(spark), qout.toString)
      .awaitTermination()
    val qsec = (System.nanoTime() - t1) / 1e9
    val qRows = spark.read.parquet(s"$qout/orderbook_deltas").count()
    println(f"""{"metric":"queue_ingest","messages":$msgs,"sec":$qsec%.2f,"msgs_per_sec":${msgs / qsec}%.0f,"delta_rows":$qRows}""")
    spark.stop()
  }
}
