package graft.orderbook

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.init()

  def explodedSnaps = Normalize.explodeSnapshots(
    Normalize.parseSnapshotEntries(Fixtures.snapshotEntries(spark)))

  test("A10 explode: one row per (message, side, level)") {
    // 3 tickers × 2 snapshots × 2 sides × 3 levels
    assert(explodedSnaps.count() === 3 * 2 * 2 * 3)
  }

  test("A10 explode conserves contracts") {
    val got = explodedSnaps.agg(sum("contracts")).head.getLong(0)
    val want = Fixtures.snaps
      .flatMap(s => s.yes.map(_._2) ++ s.no.map(_._2)).map(_.toLong).sum
    assert(got === want)
  }

  private def shape(s: org.apache.spark.sql.types.StructType) =
    s.map(f => (f.name, f.dataType))

  test("A12 typing matches the declared fact-table schema") {
    assert(shape(explodedSnaps.schema) === shape(Schemas.snapshotsTable))
    val flat = Normalize.flattenDeltas(
      Normalize.parseDeltaEntries(Fixtures.deltaEntries(spark)))
    assert(shape(flat.schema) === shape(Schemas.deltasTable))
  }

  test("decimal fidelity: 0.40 parses to exactly 0.4000") {
    val p = explodedSnaps.where(col("side") === "yes")
      .agg(min("price_dollars")).head.getDecimal(0)
    assert(p.compareTo(new java.math.BigDecimal("0.4000")) === 0)
    assert(p.scale === 4)
  }

  test("A11 flatten keeps values and lineage") {
    val flat = Normalize.flattenDeltas(
      Normalize.parseDeltaEntries(Fixtures.deltaEntries(spark)))
    val d = Fixtures.deltas.head
    val row = flat.where(col("redis_stream_id") === d.streamId).head
    assert(row.getAs[String]("ticker") === d.ticker)
    assert(row.getAs[String]("side") === d.side)
    assert(row.getAs[Int]("delta") === d.delta)
    assert(row.getAs[Long]("timestamp") === d.ingestionTs)
  }

  test("A15 dedup restores exact counts after replay") {
    val dup = Normalize.parseDeltaEntries(
      Fixtures.deltaEntries(spark, duplicateFirst = true))
    assert(dup.count() === Fixtures.deltas.size + 1)
    val deduped = Normalize.dedupReplays(
      Normalize.flattenDeltas(dup), Seq("redis_stream_id"))
    assert(deduped.count() === Fixtures.deltas.size)
  }

  // Seq continuity is a property of the FULL message stream (snapshots +
  // deltas interleaved), as the ws client validates it.
  private def fullStream(dropSeq: Option[Long]) = {
    val snapsDf = Normalize.parseSnapshotEntries(
      Fixtures.snapshotEntries(spark)).select("sid", "seq")
    val deltasDf = Normalize.parseDeltaEntries(
      Fixtures.deltaEntries(spark, dropSeq = dropSeq)).select("sid", "seq")
    snapsDf.unionByName(deltasDf)
  }

  test("A3 seq-gap flags exactly the message after a dropped seq") {
    val flagged = Normalize.seqGapFlags(fullStream(Some(5L)))
      .where(col("seq_gap"))
    val rows = flagged.select("sid", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Fixtures.tickers.indices.map(i => (i + 1L, 6L)).toSet)
  }

  test("no-gap stream yields zero flags") {
    assert(Normalize.seqGapFlags(fullStream(None))
      .where(col("seq_gap")).count() === 0)
  }
}
