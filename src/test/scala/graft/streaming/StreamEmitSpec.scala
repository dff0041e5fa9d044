package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** st20's emitter — [[ParquetEmit.emitExactlyOnce]]. The gate already
  * proves full-feed redelivery no-ops (the census over emitted files
  * vs the batch oracle after TWO complete runs). This spec pins the
  * crash points a clean double-run can't reach:
  *  - committed batch → replay returns false and writes nothing new;
  *  - crash AFTER the promote but BEFORE the marker (the torn window)
  *    → the re-run overwrites the same deterministic names, no
  *    duplicates;
  *  - crash mid-stage (stage dir left behind, nothing promoted) → the
  *    re-run clears the junk and ships the batch once;
  *  - bookkeeping dirs are invisible to readers. */
class StreamEmitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private def batchDf(ids: Long*) = {
    import spark.implicits._
    ids.toDF("doc_id")
      .select(col("doc_id"), lit("en").as("lang"),
        (col("doc_id") * 10).as("n_tokens"),
        when(col("doc_id") % 2 === 0, "train").otherwise("val")
          .as("split"),
        (col("doc_id") % 4).as("shard"))
  }

  private def emitted(out: String) =
    spark.read.parquet(out).select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq

  test("a committed batch replays as a no-op; distinct batches append") {
    val out = Files.createTempDirectory("graft-emit-spec").toString
    assert(ParquetEmit.emitExactlyOnce(batchDf(1L, 2L), out, "q", 0L))
    assert(!ParquetEmit.emitExactlyOnce(batchDf(1L, 2L), out, "q", 0L),
      "replayed batch was not refused")
    assert(ParquetEmit.emitExactlyOnce(batchDf(3L), out, "q", 1L))
    assert(emitted(out) === Seq(1L, 2L, 3L))
  }

  test("crash after promote but before the marker: the re-run " +
      "overwrites the same names — no duplicates") {
    val out = Files.createTempDirectory("graft-emit-spec").toString
    assert(ParquetEmit.emitExactlyOnce(batchDf(1L, 2L), out, "q", 0L))
    // simulate the torn window: data promoted, marker lost
    val marker = new java.io.File(out, "_graft_commits/q-0")
    assert(marker.isFile, "marker missing after a successful emit")
    assert(marker.delete())
    // the engine re-runs the batch; promote must land on the SAME
    // deterministic names, leaving the file set identical
    assert(ParquetEmit.emitExactlyOnce(batchDf(1L, 2L), out, "q", 0L))
    assert(emitted(out) === Seq(1L, 2L),
      "torn-window re-run duplicated rows")
  }

  test("crash mid-stage: leftover stage junk is cleared and the batch " +
      "ships exactly once; bookkeeping dirs stay invisible") {
    val out = Files.createTempDirectory("graft-emit-spec").toString
    // a previous attempt died after staging some files, before promote
    val junk = new java.io.File(out, "_graft_stage/q-0/split=train/shard=0")
    assert(junk.mkdirs())
    Files.writeString(junk.toPath.resolve("part-junk.parquet"), "junk")
    assert(ParquetEmit.emitExactlyOnce(batchDf(2L, 4L), out, "q", 0L))
    assert(emitted(out) === Seq(2L, 4L))
    // _graft_* never leaks into what a reader sees
    assert(!spark.read.parquet(out).columns.isEmpty)
    assert(new java.io.File(out, "_graft_commits/q-0").isFile)
    assert(!new java.io.File(out, "_graft_stage/q-0").exists,
      "stage dir survived a successful emit")
  }
}
