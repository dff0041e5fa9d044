package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** Partition PRUNING as an oracle-gated operator (op03): the
  * directory-partitioned layout + partition-filter scan that lets a
  * 100 TB table answer a one-status query by never LISTING the other
  * statuses' files — the filter is resolved against the directory
  * names at planning time (`PartitionFilters` in the scan, pinned in
  * PlanSpec), so cost scales with the selected partition, not the
  * table. CompactionSpec pins the same property on the writer side;
  * this registers the read side in the correctness registry.
  *
  * The partitioned copy is the fixture, not the operator: one
  * deterministic per-corpus dir (same overwrite discipline as q49 —
  * no per-invocation leak), the oracle recomputes from the base
  * table. */
object Pruning {

  private val dec = DecimalType(18, 2)

  def partitionPruned(s: SparkSession, d: String): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft-part-$digest")
    Tables.orders(s, d)
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(dir.toString)
    s.read.parquet(dir.toString)
      .where(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).cast(DoubleType).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val partitionPrunedSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "op03_partition_pruned" -> (partitionPruned _))

  val oracles: Seq[(String, String)] = Seq(
    "op03_partition_pruned" -> partitionPrunedSql)
}
