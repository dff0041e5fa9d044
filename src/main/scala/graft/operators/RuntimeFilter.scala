package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** Spark's OWN runtime bloom-filter injection as an oracle-gated
  * operator (op04) — the optimizer-automated twin of dd10's hand-built
  * Bloom route: a selective filter sits on the CREATION side (orders
  * pruned to one urgent status) of a fact⋈fact shuffle join, and the
  * `InjectRuntimeFilter` rule plants a `BloomFilterAggregate` subquery
  * over the filtered keys whose `might_contain` probe prunes the PROBE
  * side (lineitem) map-side, before the join shuffle moves a row.
  * This is the regime where the dimension is too big to broadcast at
  * 100 TB (so a true broadcast join is off the table) but its KEY SET
  * sketches into megabytes — exactly dd10's argument, now produced by
  * the engine's optimizer rule instead of by hand.
  *
  * The conf dance: injection is gated on thresholds tuned for clusters
  * (probe scan ≥ 10 GB), so the query lowers them to local-data scale,
  * FREEZES its physical plan while they apply (`executedPlan` is a
  * lazy val — forcing it pins the injected filter into the plan this
  * DataFrame executes), then restores every key so the session's other
  * queries plan under stock confs. PlanSpec pins `might_contain` in
  * the frozen plan. Broadcast stays disabled for THIS plan only — the
  * whole point is the non-broadcastable join.
  */
object RuntimeFilter {

  private val dec = DecimalType(18, 2)

  def runtimeFiltered(s: SparkSession, d: String): DataFrame = {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT" &&
               col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linestatus"), col("l_quantity"))
      val df = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("qty"))
        .orderBy(col("l_linestatus"))
      df.queryExecution.executedPlan // freeze the injected-filter plan
      df
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  val runtimeFilteredSql: String =
    """SELECT l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "op04_runtime_filter" -> (runtimeFiltered _))

  val oracles: Seq[(String, String)] = Seq(
    "op04_runtime_filter" -> runtimeFilteredSql)
}
