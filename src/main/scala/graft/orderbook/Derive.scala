package graft.orderbook

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.Tables

/** Deterministic order-book fact tables derived from the `events` table.
  *
  * The reference's snapshot/delta tables (postgres_client.py:29-48) are fed
  * by a live exchange; offline, the correctness gate needs the SAME rows
  * producible by both Spark and the DuckDB oracle from the shared parquet.
  * So the book facts are a pure function of `events`, defined twice in
  * lockstep: the DataFrame builders below and the [[cte]] SQL prefix every
  * order-book oracle query shares. All arithmetic is integer/string — no
  * floats anywhere near the hash comparison.
  *
  * Shapes match the reference exactly:
  *  - ob_deltas ≙ orderbook_deltas (consumer.py:131-162): one signed
  *    size-change per (ticker, side, price) with a per-ticker monotone seq
  *    (kalshi_ws_client.py:129-146).
  *  - ob_snapshots ≙ orderbook_snapshots (consumer.py:51-96): every 10th
  *    event anchors a full-book snapshot, 3 levels per side, exploded to
  *    one row per (side, level) — the A10 explode output.
  */
object Derive {

  /** Number of synthetic tickers the global event_id space is shared
    * by (user_id % 20) — the density correction for bucketing a
    * globally-dense ordinal by a per-ticker key
    * ([[Analytics.eventScanWidth]]). */
  val TickerFanout = 20L

  private def tickerCol =
    concat(lit("T"), (col("user_id") % TickerFanout).cast(StringType))

  /** One delta message per event. NOTE: the per-ticker row_number
    * assigning `seq` is DATA SYNTHESIS, not an operator under test —
    * in the reference the exchange stamps seq on the wire
    * (kalshi_ws_client.py:129-146), so production plans never contain
    * this window; the analytic queries must (and do — PlanSpec) avoid
    * whole-ticker windows of their own. */
  def deltas(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.select(
        col("ts_ms"),
        tickerCol.as("ticker"),
        when(col("event_id") % 2 === 0, "yes").otherwise("no").as("side"),
        (col("event_id") % 99 + 1).cast(IntegerType).as("price"),
        (col("event_id") % 21 - 10).cast(IntegerType).as("delta"),
        col("event_id"))
      .withColumn("seq",
        row_number().over(
          Window.partitionBy(col("ticker")).orderBy(col("event_id")))
          .cast(LongType))
  }

  /** Exploded snapshot levels: every 10th event × {yes,no} × 3 levels.
    * Built the way the real pipeline builds it (A10): nested
    * array-of-struct ladders, explode per side, side-tag literals,
    * unionByName — so the explode plan itself is under test, not just the
    * row set. */
  def snapshots(s: SparkSession, d: String): DataFrame = {
    val anchors = Tables.events(s, d)
      .where(col("event_id") % 10 === 0)
      .select(col("ts_ms"), tickerCol.as("ticker"), col("event_id"))
    val withLadder = anchors.withColumn("levels", expr(
      """transform(sequence(1, 3), l -> struct(
        |  cast(event_id % 90 + l as int) as price,
        |  cast(event_id % 50 + 10 * l as int) as contracts))""".stripMargin))
    def side(tag: String) = withLadder.select(
      col("ts_ms"), col("ticker"), lit(tag).as("side"),
      explode(col("levels")).as("lvl"), col("event_id"))
    side("yes").unionByName(side("no"))
      .select(col("ts_ms"), col("ticker"), col("side"),
        col("lvl.price").as("price"), col("lvl.contracts").as("contracts"),
        col("event_id"))
  }

  /** ob_deltas with duplicate messages injected (at-least-once replay:
    * every 100th message delivered twice — consumer.py:98-107 semantics). */
  def deltasWithDups(s: SparkSession, d: String): DataFrame = {
    val base = deltas(s, d)
    base.unionByName(base.where(col("event_id") % 100 === 0))
  }

  /** ob_deltas with every 13th message dropped (a transport gap the A3
    * sequence validator must flag). */
  def deltasWithGaps(s: SparkSession, d: String): DataFrame =
    deltas(s, d).where(col("event_id") % 13 =!= 0)

  /** DuckDB mirror of the derivations above; prefixed to every order-book
    * oracle query. Kept adjacent to the Spark builders — change both or
    * neither. */
  val cte: String =
    """WITH ob_deltas AS (
      |  SELECT epoch_ms(ts) AS ts_ms,
      |         'T' || CAST(user_id % 20 AS VARCHAR) AS ticker,
      |         CASE WHEN event_id % 2 = 0 THEN 'yes' ELSE 'no' END AS side,
      |         CAST(event_id % 99 + 1 AS INTEGER) AS price,
      |         CAST(event_id % 21 - 10 AS INTEGER) AS delta,
      |         event_id,
      |         ROW_NUMBER() OVER (PARTITION BY user_id % 20 ORDER BY event_id) AS seq
      |  FROM events),
      |ob_snapshots AS (
      |  SELECT epoch_ms(e.ts) AS ts_ms,
      |         'T' || CAST(e.user_id % 20 AS VARCHAR) AS ticker,
      |         s.side,
      |         CAST(e.event_id % 90 + l.lvl AS INTEGER) AS price,
      |         CAST(e.event_id % 50 + 10 * l.lvl AS INTEGER) AS contracts,
      |         e.event_id
      |  FROM events e
      |  CROSS JOIN (VALUES (1), (2), (3)) AS l(lvl)
      |  CROSS JOIN (VALUES ('yes'), ('no')) AS s(side)
      |  WHERE e.event_id % 10 = 0),
      |ob_deltas_dup AS (
      |  SELECT * FROM ob_deltas
      |  UNION ALL SELECT * FROM ob_deltas WHERE event_id % 100 = 0),
      |ob_deltas_gappy AS (
      |  SELECT * FROM ob_deltas WHERE event_id % 13 <> 0)
      |""".stripMargin
}
