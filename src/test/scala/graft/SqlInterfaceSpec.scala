package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlInterfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val sf = "/root/testdata/sf0.001"

  test("pure SQL text over the registered views, native functions included") {
    val df = SqlInterface.sql(spark, sf,
      """SELECT lang, COUNT(*) AS n,
        |       COUNT(DISTINCT graft_polyhash(text)) AS n_distinct_fp
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // fingerprint-distinct can never exceed the row count
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  /** Spark 4.1's HybridAnalyzer can route SQL text through the new
    * single-pass resolver (tentatively enabled by default, with a
    * legacy fallback). The five SQL-text registry queries must analyze
    * under both REALISTIC resolver modes — legacy-only and
    * hybrid-with-fallback — since a cluster can pin either. (Strict
    * `singlePassResolver.enabled=true` is deliberately NOT exercised:
    * Spark itself throws UNSUPPORTED_SINGLE_PASS_ANALYZER_FEATURE for
    * plan shapes the new resolver doesn't cover yet; the hybrid mode's
    * fallback exists precisely for those.) */
  test("SQL-text registry queries analyze under both resolver modes") {
    val key = "spark.sql.analyzer.singlePassResolver.enabled"
    val tentative = "spark.sql.analyzer.singlePassResolver.enabledTentatively"
    val sqlRouted = Seq("q27_min_cost_supplier", "q34_grouping_sets",
      "q40_hierarchy_walk", "q51_notin_null", "q52_lateral")
      .filter(SparkEntry.queries.contains)
    assert(sqlRouted.size == 5, s"SQL-routed set drifted: $sqlRouted")
    val saved = Seq(key, tentative).map(k => k -> spark.conf.getOption(k))
    try {
      for ((mode, t) <- Seq("legacy" -> "false", "hybrid" -> "true")) {
        spark.conf.set(key, "false")
        spark.conf.set(tentative, t)
        sqlRouted.foreach { n =>
          try {
            // analysis is the seam under test; one row bounds the cost
            val df = SparkEntry.queries(n)(spark, sf)
            df.queryExecution.analyzed // force analysis
            df.limit(1).collect()
          } catch { case e: Throwable =>
            fail(s"$n failed under $mode resolver mode: ${e.getMessage}", e)
          }
        }
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("SQL joins across views agree with the DataFrame spelling") {
    import org.apache.spark.sql.functions._
    val viaSql = SqlInterface.sql(spark, sf,
      """SELECT o_orderstatus, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql === viaDf)
  }
}
