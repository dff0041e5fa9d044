package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import graft.Tables

/** Warehouse-maintenance operators: the two batch mutations every
  * training-data / analytics pipeline ships around its fact tables —
  * MERGE-style change application (CDC apply / upsert) and slowly-
  * changing-dimension type-2 history construction from an event log.
  *
  * Neither exists in the reference (its consumer only ever appends —
  * `consumer.py:98-107` is insert-then-ack); these are the operations a
  * user runs ON the tables that append path produces.
  *
  * Both are expressed declaratively so the 100 TB plan is the one
  * Catalyst already optimizes: MERGE is one pre-aggregated source
  * (map-side partials) full-outer-joined to the target on the merge key
  * — the standard shuffle-on-key apply, bucketable/AQE-skew-handled;
  * SCD2 is run-compression + effective ranges over ONE hash exchange on
  * the entity key (every window and the run aggregation reuse the same
  * user_id clustering — no second shuffle until the presentation sort).
  */
object Maintenance {

  private val dec = DecimalType(18, 2)

  // ---------------------------------------------------------------- q29
  /** MERGE INTO customer USING (aggregated order activity) — all three
    * branches materialized, tagged, and auditable:
    *   - matched           → update: balance += order-revenue delta
    *   - not matched       → insert: subsidiary account rows (key+1e6,
    *                         minted from every 10th active customer)
    *   - not matched by source → keep: untouched target rows
    * Output is the post-merge table plus the action tag, so the oracle
    * pins branch routing, not just final values. Decimal-exact
    * arithmetic end-to-end; DOUBLE only at the output boundary. */
  def q29MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("custkey"), col("c_name"),
        col("c_acctbal"), col("c_nationkey"))
    val activity = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).as("delta"))
    // staged change set: an update row per active customer, plus an
    // insert row (key shifted +1,000,000) for every 10th one
    val src = activity
      .select(col("o_custkey").as("custkey"), col("n_orders"), col("delta"))
      .unionByName(activity.where(col("o_custkey") % 10 === 0)
        .select((col("o_custkey") + 1000000L).as("custkey"),
          col("n_orders"), col("delta")))
    cust.join(src, Seq("custkey"), "full_outer")
      .select(
        col("custkey"),
        when(col("c_name").isNull, lit("insert"))
          .when(col("n_orders").isNull, lit("keep"))
          .otherwise(lit("update")).as("action"),
        coalesce(col("c_name"),
          concat(lit("Subsidiary#"), col("custkey") - 1000000L)).as("name"),
        (coalesce(col("c_acctbal").cast(dec), lit(0).cast(dec)) +
          coalesce(col("delta"), lit(0).cast(dec)))
          .cast(DoubleType).as("acctbal"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("custkey"))
  }

  val q29Sql: String =
    """WITH activity AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS delta
      |  FROM orders GROUP BY o_custkey),
      |src AS (
      |  SELECT o_custkey AS custkey, n_orders, delta FROM activity
      |  UNION ALL
      |  SELECT o_custkey + 1000000 AS custkey, n_orders, delta
      |  FROM activity WHERE o_custkey % 10 = 0)
      |SELECT
      |  COALESCE(c.c_custkey, s.custkey) AS custkey,
      |  CASE WHEN c.c_name IS NULL THEN 'insert'
      |       WHEN s.n_orders IS NULL THEN 'keep'
      |       ELSE 'update' END AS action,
      |  COALESCE(c.c_name,
      |    'Subsidiary#' || CAST(s.custkey - 1000000 AS VARCHAR)) AS name,
      |  CAST(COALESCE(CAST(c.c_acctbal AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2)))
      |    + COALESCE(s.delta, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS acctbal,
      |  COALESCE(s.n_orders, 0) AS n_orders
      |FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.custkey
      |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- q30
  /** SCD type-2 history from the event log: per user, consecutive
    * events with the same event_type compress to one RUN (change
    * detection via lag over the deterministic (ts_ms, event_id) order),
    * and each run becomes a versioned dimension row with
    * [effective_from, effective_to) millisecond validity — open range
    * (-1) and is_current=1 on the latest run. The entity filter keeps
    * the result set bounded like every other events query. */
  def q30Scd2History(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .where(col("user_id") % 91 === 0)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_ms"))
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val runs = ev
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(wOrd).isNull ||
          lag(col("event_type"), 1).over(wOrd) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(first(col("event_type")).as("event_type"),
        min(col("ts_ms")).as("effective_from"),
        count(lit(1)).as("n_events"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs
      .withColumn("effective_to",
        coalesce(lead(col("effective_from"), 1).over(wRun), lit(-1L)))
      .withColumn("is_current",
        when(col("effective_to") === -1L, 1).otherwise(0).cast(IntegerType))
      .select(col("user_id"), col("run_id").cast(IntegerType).as("version"),
        col("event_type"), col("effective_from"), col("effective_to"),
        col("n_events"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val q30Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
      |  FROM events WHERE user_id % 91 = 0),
      |flagged AS (
      |  SELECT user_id, event_id, event_type, ts_ms,
      |    CASE WHEN LAG(event_type) OVER w IS NULL
      |           OR LAG(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      |numbered AS (
      |  SELECT user_id, event_type, ts_ms,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |      ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM flagged),
      |runs AS (
      |  SELECT user_id, run_id, MIN(event_type) AS event_type,
      |    MIN(ts_ms) AS effective_from, COUNT(*) AS n_events
      |  FROM numbered GROUP BY user_id, run_id)
      |SELECT user_id, CAST(run_id AS INTEGER) AS version, event_type,
      |  effective_from,
      |  COALESCE(LEAD(effective_from) OVER
      |    (PARTITION BY user_id ORDER BY run_id), -1) AS effective_to,
      |  n_events,
      |  CASE WHEN LEAD(effective_from) OVER
      |    (PARTITION BY user_id ORDER BY run_id) IS NULL
      |    THEN 1 ELSE 0 END AS is_current
      |FROM runs
      |ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Incremental view maintenance: a maintained per-customer aggregate
    * absorbs a delta batch by MERGING PARTIAL AGGREGATES — count/sum/max
    * are algebraic, so agg(base ∪ delta) = merge(agg(base), agg(delta))
    * and the base data is never rescanned. This is the contract that
    * makes 100 TB rollups maintainable (recompute touches the estate;
    * the merge touches |keys| rows) and it is exactly the algebra
    * streaming state stores run per micro-batch. The oracle is the
    * full recompute over base ∪ delta — the incremental path must be
    * indistinguishable from it. Base/delta split is deterministic
    * (orderkey mod), standing in for "yesterday's table + today's
    * partition". */
  def q31IncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    def agg(part: DataFrame): DataFrame = part
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).as("tot"),
        max(col("o_orderdate")).as("mx"))
    val base = agg(o.where(col("o_orderkey") % 7 =!= 0))
      .select(col("o_custkey"), col("n").as("n_b"), col("tot").as("tot_b"),
        col("mx").as("mx_b"))
    val delta = agg(o.where(col("o_orderkey") % 7 === 0))
      .select(col("o_custkey"), col("n").as("n_d"), col("tot").as("tot_d"),
        col("mx").as("mx_d"))
    base.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("tot_b"), lit(0).cast(dec)) +
          coalesce(col("tot_d"), lit(0).cast(dec)))
          .cast(DoubleType).as("sum_total"),
        Tables.epochMs(greatest(col("mx_b"), col("mx_d"))).as("last_ms"))
      .orderBy(col("o_custkey"))
  }

  val q31Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
      |  epoch_ms(MAX(o_orderdate)) AS last_ms
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  // ----------------------------------------------------------- registry
  // ---------------------------------------------------------------- q68
  /** q68 — DATA-QUALITY AUDIT scorecard (the expectations gate every
    * pipeline runs before publishing a table): seven declared
    * constraints over lineitem/orders — composite-key uniqueness,
    * referential integrity, two range rules, a null rule, a value
    * domain, a positivity rule — each reported as one row
    * (check, n_checked, n_failed, status). Thresholds are set so the
    * fixture exercises BOTH verdicts (qty ≤ 40 and discount ≤ 0.05
    * genuinely fail on TPC-H-shaped data; the structural checks pass) —
    * the gate pins real violation counts, not a vacuous all-zeros.
    *
    * Scale: all per-table rules fold into ONE aggregate scan per table
    * (the failure counts are conditional sums sharing a single pass —
    * materialized as an explode of the 1-row aggregate, so adding a
    * rule never adds a scan); the FK rule is one LEFT ANTI join on the
    * order key — broadcast- or shuffle-hash-joinable, the only
    * non-map-side check. Scorecard rows are O(rules), so the audit's
    * output is constant-size at any corpus scale. */
  def q68DqAudit(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val liChecks = li.agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("npk"),
        sum(when(col("l_quantity") > 40, 1L).otherwise(0L)).as("f_qty"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("f_disc"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("f_null"))
      .select(explode(array(
        struct(lit("lineitem_pk_unique").as("check"),
          col("n").as("n_checked"), (col("n") - col("npk")).as("n_failed")),
        struct(lit("lineitem_qty_le_40").as("check"),
          col("n").as("n_checked"), col("f_qty").as("n_failed")),
        struct(lit("lineitem_disc_le_005").as("check"),
          col("n").as("n_checked"), col("f_disc").as("n_failed")),
        struct(lit("lineitem_shipdate_notnull").as("check"),
          col("n").as("n_checked"), col("f_null").as("n_failed")))).as("c"))
    val ordChecks = ord.agg(
        count(lit(1)).as("n"),
        sum(when(!col("o_orderstatus").isin("O", "F"), 1L).otherwise(0L))
          .as("f_dom"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("f_pos"))
      .select(explode(array(
        struct(lit("orders_status_in_O_F").as("check"),
          col("n").as("n_checked"), col("f_dom").as("n_failed")),
        struct(lit("orders_price_positive").as("check"),
          col("n").as("n_checked"), col("f_pos").as("n_failed")))).as("c"))
    val fk = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .crossJoin(li.agg(count(lit(1)).as("n")))
      .select(struct(lit("lineitem_fk_orders").as("check"),
        col("n").as("n_checked"), col("orphans").as("n_failed")).as("c"))
    liChecks.union(ordChecks).union(fk)
      .select(col("c.check").as("check"), col("c.n_checked"),
        col("c.n_failed"),
        when(col("c.n_failed") === 0, "pass").otherwise("fail").as("status"))
      .orderBy(col("check"))
  }

  val q68Sql: String =
    """WITH li AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(DISTINCT (l_orderkey, l_linenumber)) AS npk,
      |    CAST(SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS f_qty,
      |    CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS f_disc,
      |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS f_null
      |  FROM lineitem),
      |ord AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS f_dom,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS f_pos
      |  FROM orders),
      |fk AS (
      |  SELECT (SELECT COUNT(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                            WHERE o.o_orderkey = l.l_orderkey))
      |    AS orphans,
      |    (SELECT COUNT(*) FROM lineitem) AS n),
      |rows_ AS (
      |  SELECT 'lineitem_pk_unique' AS check_, n AS n_checked,
      |    n - npk AS n_failed FROM li
      |  UNION ALL SELECT 'lineitem_qty_le_40', n, f_qty FROM li
      |  UNION ALL SELECT 'lineitem_disc_le_005', n, f_disc FROM li
      |  UNION ALL SELECT 'lineitem_shipdate_notnull', n, f_null FROM li
      |  UNION ALL SELECT 'orders_status_in_O_F', n, f_dom FROM ord
      |  UNION ALL SELECT 'orders_price_positive', n, f_pos FROM ord
      |  UNION ALL SELECT 'lineitem_fk_orders', n, orphans FROM fk)
      |SELECT check_ AS "check", CAST(n_checked AS BIGINT) AS n_checked,
      |  CAST(n_failed AS BIGINT) AS n_failed,
      |  CASE WHEN n_failed = 0 THEN 'pass' ELSE 'fail' END AS status
      |FROM rows_
      |ORDER BY "check"""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Snapshot diff / CDC extraction: classify every key across two
    * snapshots of `orders` as insert / delete / update / unchanged and
    * aggregate the reconciliation report — the audit a warehouse runs
    * between a table and its restatement (or a replica) before
    * trusting an incremental feed. "Today's" snapshot is simulated
    * deterministically from the base table (key%13 deleted, key%7
    * price-bumped 500¢ + status-forced 'F', every key%50 cloned past
    * max(key) as an insert — the offset is a data-derived broadcast
    * scalar, so cloned keys can never collide with real orderkeys at
    * any SF), so both engines construct byte-identical inputs with no
    * side files.
    *
    * Plan shape at scale: each side reduces to (key, digest, price)
    * MAP-SIDE — md5 over the canonicalized attribute string — then ONE
    * full-outer hash join on the key decides the class by digest
    * (in)equality. For a 100-column fact table the exchange carries
    * 8+16 bytes per row instead of the row width; that digest-narrow
    * full-outer join is the standard snapshot-reconciliation shape
    * (bucketable on key, AQE-skew-splittable, and incremental feeds
    * diff only changed partitions). Price survives alongside the
    * digest only because the report wants the cents delta. */
  def q69SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
      (col("o_totalprice").cast(dec) * 100)
        .cast(org.apache.spark.sql.types.LongType).as("price_c"))
    val b = base.where(col("key") % 13 =!= 0)
      .select(col("key"),
        when(col("key") % 7 === 0, "F").otherwise(col("status"))
          .as("status"),
        when(col("key") % 7 === 0, col("price_c") + 500)
          .otherwise(col("price_c")).as("price_c"))
      .unionAll(base.where(col("key") % 50 === 0)
        .crossJoin(broadcast(
          base.agg((max(col("key")) + 1L).as("ins_off"))))
        .select((col("key") + col("ins_off")).as("key"),
          lit("N").as("status"), lit(999900L).as("price_c")))
    def digested(df: DataFrame, side: String): DataFrame = df.select(
      col("key").as(s"${side}_key"),
      md5(concat_ws("|", col("status"), col("price_c").cast("string")))
        .as(s"${side}_dig"),
      col("price_c").as(s"${side}_price"))
    val joined = digested(base, "a").join(digested(b, "b"),
      col("a_key") === col("b_key"), "full_outer")
    joined.select(
        when(col("a_key").isNull, "insert")
          .when(col("b_key").isNull, "delete")
          .when(col("a_dig") =!= col("b_dig"), "update")
          .otherwise("unchanged").as("change_type"),
        coalesce(col("a_key"), col("b_key")).as("key"),
        (coalesce(col("b_price"), lit(0L)) -
          coalesce(col("a_price"), lit(0L))).as("delta_c"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"), sum(col("delta_c")).as("sum_delta_c"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy(col("change_type"))
  }

  val q69Sql: String =
    """WITH a AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_c
      |  FROM orders),
      |b AS (
      |  SELECT key,
      |    CASE WHEN key % 7 = 0 THEN 'F' ELSE status END AS status,
      |    CASE WHEN key % 7 = 0 THEN price_c + 500 ELSE price_c END
      |      AS price_c
      |  FROM a WHERE key % 13 <> 0
      |  UNION ALL
      |  SELECT key + (SELECT MAX(key) + 1 FROM a), 'N', 999900
      |  FROM a WHERE key % 50 = 0),
      |ad AS (SELECT key, md5(status || '|' || CAST(price_c AS VARCHAR))
      |         AS dig, price_c FROM a),
      |bd AS (SELECT key, md5(status || '|' || CAST(price_c AS VARCHAR))
      |         AS dig, price_c FROM b),
      |d AS (
      |  SELECT CASE WHEN ad.key IS NULL THEN 'insert'
      |              WHEN bd.key IS NULL THEN 'delete'
      |              WHEN ad.dig <> bd.dig THEN 'update'
      |              ELSE 'unchanged' END AS change_type,
      |    COALESCE(ad.key, bd.key) AS key,
      |    COALESCE(bd.price_c, 0) - COALESCE(ad.price_c, 0) AS delta_c
      |  FROM ad FULL OUTER JOIN bd ON ad.key = bd.key)
      |SELECT change_type, COUNT(*) AS n,
      |  CAST(SUM(delta_c) AS BIGINT) AS sum_delta_c,
      |  MIN(key) AS min_key, MAX(key) AS max_key
      |FROM d GROUP BY change_type
      |ORDER BY change_type""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q29_merge_upsert" -> (q29MergeUpsert _),
    "q30_scd2_history" -> (q30Scd2History _),
    "q31_incremental_agg" -> (q31IncrementalAgg _),
    "q68_dq_audit" -> (q68DqAudit _),
    "q69_snapshot_diff" -> (q69SnapshotDiff _))

  val oracles: Seq[(String, String)] = Seq(
    "q29_merge_upsert" -> q29Sql,
    "q30_scd2_history" -> q30Sql,
    "q31_incremental_agg" -> q31Sql,
    "q68_dq_audit" -> q68Sql,
    "q69_snapshot_diff" -> q69Sql)
}
