package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** graft_topk must equal the row_number()-window spelling row for row —
  * the exactness claim the similarity queries' oracles rest on. The
  * input is spread over many partitions so the ObjectHashAggregate
  * partial/merge path (serialize → shuffle → deserialize → merge) is
  * actually exercised, not just a single-buffer update loop. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private def scored(n: Int, nQueries: Int) = {
    GraftFunctions.register(spark)
    spark.range(0, n, 1, 16).selectExpr(
      s"id % $nQueries AS query_id",
      "id AS neighbor_id",
      // deterministic pseudo-scores with deliberate collisions (% 7) so
      // the unique-tiebreak path is hit, plus an extra payload column
      s"cast(hash(id) % 7 as double) AS sc",
      "cast(id * 3 as double) AS extra")
  }

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sc").desc, col("neighbor_id"))
    df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sc"), col("extra"),
        col("rnk").cast("int").as("rnk"))
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("query_id"))
      .agg(call_function("graft_topk", col("sc"), col("neighbor_id"),
        struct(col("neighbor_id"), col("sc"), col("extra")), lit(k))
        .as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.neighbor_id"), col("col.sc"),
        col("col.extra"), (col("pos") + 1).cast("int").as("rnk"))

  test("graft_topk equals the window top-k, ranks and payload included") {
    val df = scored(5000, 7)
    val ord = Seq(col("query_id"), col("rnk"))
    assert(viaAgg(df, 5).orderBy(ord: _*).collect().toSeq ===
      viaWindow(df, 5).orderBy(ord: _*).collect().toSeq)
  }

  test("groups smaller than k emit all rows; k = 1 emits the max") {
    val df = scored(40, 25) // 1-2 rows per query
    val ord = Seq(col("query_id"), col("rnk"))
    assert(viaAgg(df, 5).orderBy(ord: _*).collect().toSeq ===
      viaWindow(df, 5).orderBy(ord: _*).collect().toSeq)
    assert(viaAgg(df, 1).orderBy(ord: _*).collect().toSeq ===
      viaWindow(df, 1).orderBy(ord: _*).collect().toSeq)
  }

  test("null scores and null tiebreaks are skipped, not ranked") {
    GraftFunctions.register(spark)
    val df = spark.range(0, 100, 1, 8).selectExpr(
      "id % 2 AS query_id",
      "id AS neighbor_id",
      "CASE WHEN id % 10 = 0 THEN NULL ELSE cast(id as double) END AS sc",
      "cast(0 as double) AS extra")
    val got = viaAgg(df, 3).collect()
    assert(got.length === 6)
    // nulls never beat real scores: top ids are the largest non-null ids
    assert(got.map(_.getLong(1)).toSet === Set(99L, 98L, 97L, 96L, 95L, 94L))
  }

  test("the plan is an ObjectHashAggregate with a map-side partial stage") {
    val df = viaAgg(scored(5000, 7), 5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_graft_topk"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }
}
