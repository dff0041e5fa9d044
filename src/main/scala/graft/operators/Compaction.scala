package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side layout control — the half of 100 TB engineering that
  * happens AFTER the plan is right. Two failure modes dominate large
  * parquet estates:
  *
  *   - the small-files problem: a 32k-task job writing 32k files per
  *     partition turns the NEXT reader's planning phase into a metadata
  *     crawl (and object-store LIST storms);
  *   - unclustered files: when every file's min/max spans the whole key
  *     domain, predicate pushdown prunes nothing and every query pays a
  *     full scan.
  *
  * `compactBalanced` fixes the first: round-robin repartition to
  * ceil(n / targetRows) output files of near-equal row count (row count
  * is the stable proxy for bytes on a fixed schema). `compactClustered`
  * fixes both: range-repartition + in-partition sort on the cluster
  * key, so each file owns a DISJOINT key range and a reader filtering
  * on the key prunes to the few files whose [min,max] intersect —
  * parquet row-group stats do the rest. Both are pure layout rewrites:
  * same rows, same schema (asserted by CompactionSpec round-trips).
  *
  * The file-count decision is driven by a COUNT over the input, not a
  * guess: at cluster scale a stale estimate is how a 10× growth quietly
  * recreates the problem the compactor exists to solve. The count is
  * one metadata-cheap pass (parquet footers for plain scans) and the
  * write is the expensive part anyway.
  */
object Compaction {

  /** One sizing policy for every layout: COUNT the input, ceil-divide
    * by the per-file row target. */
  private def fileCount(df: DataFrame, targetRows: Long): Int = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val n = df.count()
    math.max(1L, (n + targetRows - 1) / targetRows)
      .min(Int.MaxValue.toLong).toInt
  }

  /** Rows-balanced layout: ceil(rows / targetRows) files, round-robin
    * filled, so no file exceeds ~targetRows and sizes are near-equal.
    * Use when downstream reads are full-scan shaped (no dominant
    * filter key) and the only goal is sane file counts. */
  def compactBalanced(df: DataFrame, targetRows: Long): DataFrame =
    df.repartition(fileCount(df, targetRows))

  /** Range-clustered layout: files own disjoint ranges of `key`, rows
    * sorted by `key` within each file (maximally tight row-group
    * stats). Readers filtering on `key` prune to the intersecting
    * files; everything else still sees balanced sizes because range
    * boundaries come from sampling the actual key distribution. */
  def compactClustered(df: DataFrame, key: Column, targetRows: Long)
      : DataFrame =
    df.repartitionByRange(fileCount(df, targetRows), key)
      .sortWithinPartitions(key)

  /** Hive-partitioned estate layout: directory partition on a coarse
    * column (a time bucket, a tenant) + in-partition clustering on the
    * query key. Partition pruning then happens at PLANNING time — a
    * filtered reader never LISTS the other directories, the only
    * pruning that still works when the estate has a million files —
    * and the secondary key prunes row groups within the survivors.
    * One shuffle: repartition on (partition, range-bucket of key) so
    * each task writes exactly one file into one directory — without
    * this, every task appends to every partition directory and the
    * small-files problem comes back multiplied by the task count.
    * Call as `.write.partitionBy(partCol).parquet(...)` on the result;
    * the writer derives directories from the same column. */
  def compactPartitioned(df: DataFrame, partCol: Column, key: Column,
      targetRows: Long): DataFrame =
    df.repartitionByRange(fileCount(df, targetRows), partCol, key)
      .sortWithinPartitions(partCol, key)

  /** 16-bit Morton spread: the low 16 bits of `x` interleaved with
    * zeros (…b2 0 b1 0 b0). Plain integer Column ops — codegen'd, no
    * UDF anywhere near the write path. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-ORDERED layout: files cluster on the Morton interleave of TWO
    * numeric keys, so a filter on EITHER key prunes files — the
    * multi-dimensional clustering `compactClustered` can't give (a
    * single-key sort leaves the second key's per-file min/max spanning
    * the whole domain, pruning nothing). Each key is min/max-scaled to
    * 16 bits (two tiny aggregates broadcast back — linear scaling; a
    * skewed estate would swap in histogram ranks, same interleave),
    * the z-value range-partitions and sorts the files, and contiguous
    * z-ranges are approximate 2-D rectangles: a predicate on either
    * dimension intersects only the files whose rectangle crosses it.
    * Same rows/schema out (CompactionSpec round-trips); the z column
    * never outlives the write. */
  def compactZOrdered(df: DataFrame, keyA: Column, keyB: Column,
      targetRows: Long): DataFrame = {
    val bounds = df.agg(
      min(keyA.cast("long")).as("a_lo"), max(keyA.cast("long")).as("a_hi"),
      min(keyB.cast("long")).as("b_lo"), max(keyB.cast("long")).as("b_hi"))
    // `/` is double division in Column algebra — floor back to a long
    // (the scaled value is <= 65535, far inside double's exact range)
    def scaled(k: Column, lo: Column, hi: Column): Column =
      when(hi > lo,
        floor((k.cast("long") - lo) * 65535L / (hi - lo))).otherwise(0L)
    val z = spread16(scaled(keyA, col("a_lo"), col("a_hi")))
      .bitwiseOR(shiftleft(spread16(scaled(keyB, col("b_lo"), col("b_hi"))), 1))
    val cols = df.columns.toSeq
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .repartitionByRange(fileCount(df, targetRows), col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(cols.map(col): _*)
  }
}
