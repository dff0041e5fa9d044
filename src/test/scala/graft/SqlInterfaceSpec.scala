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
