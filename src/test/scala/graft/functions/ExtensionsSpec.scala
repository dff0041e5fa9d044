package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  test("native functions resolve from SQL without imperative register") {
    // session built by GraftSession carries spark.sql.extensions
    assert(spark.conf.get("spark.sql.extensions") ===
      "graft.functions.GraftExtensions")
    assert(spark.sql("SELECT graft_polyhash('abc') AS v").head.getLong(0) ===
      ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(spark.sql(
      "SELECT graft_vec_dot(array(1d,2d), array(3d,4d)) AS v")
      .head.getDouble(0) === 11.0)
  }

  test("VecDotRewrite turns the HOF dot idiom into the native expression") {
    // non-literal source so constant folding can't hide the rewrite
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(expr("transform(embedding, x -> cast(x as double))").as("e"))
      .select(expr(
        "aggregate(zip_with(e, e, (x, y) -> x * y), 0d, (acc, v) -> acc + v)")
        .as("norm2"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_vec_dot"),
      df.queryExecution.optimizedPlan.toString)
    val viaNative = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(expr("transform(embedding, x -> cast(x as double))").as("e"))
      .select(call_function("graft_vec_dot", col("e"), col("e")).as("norm2"))
    assert(df.agg(sum("norm2")).head.getDouble(0) ===
      viaNative.agg(sum("norm2")).head.getDouble(0))
  }

  test("VecDotRewrite fires on the pure SQL-text spelling too") {
    graft.SqlInterface.registerViews(spark, "/root/testdata/sf0.001")
    val df = spark.sql(
      """SELECT vec_id,
        |  aggregate(zip_with(e, e, (x, y) -> x * y), 0d,
        |            (acc, v) -> acc + v) AS norm2
        |FROM (SELECT vec_id,
        |        transform(embedding, x -> cast(x AS double)) AS e
        |      FROM embeddings)""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_vec_dot"),
      df.queryExecution.optimizedPlan.toString)
    assert(df.count() > 0)
  }

  test("rewrite preserves the null-on-length-mismatch semantics") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)")
        .as("dot"))
    assert(df.head.isNullAt(0))
  }

  test("rewrite leaves non-dot aggregates alone") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x + y), 0d, (acc, v) -> acc + v)")
        .as("s"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_vec_dot"))
    assert(df.head.getDouble(0) === 10.0)
  }
}
