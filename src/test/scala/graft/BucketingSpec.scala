package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB co-location story: facts bucketed on the join key join
  * WITHOUT an Exchange on either side — the shuffle happens once at
  * write time and is amortized over every subsequent join. This is the
  * strategy the engine's big fact⋈fact joins (lineitem⋈orders,
  * snapshots⋈deltas) would ship with on a cluster. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs with zero Exchange") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      Tables.orders(spark, sf)
        .select("o_orderkey", "o_orderstatus")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum(col("l_quantity").cast("double")).as("qty"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      // the aggregate may exchange on its own key; the JOIN must not
      val joinSection = p.split("SortMergeJoin|ShuffledHashJoin").last
      assert(p.contains("Join"), p)
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")

      // same rows as the unbucketed plan
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum(col("l_quantity").cast("double")).as("qty"))
      assert(joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
        === plain.collect().map(r => (r.getString(0), r.getDouble(1))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
