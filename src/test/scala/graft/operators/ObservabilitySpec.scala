package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ObservabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val sf = "/root/testdata/sf0.001"

  test("observe() metrics on a curation gate equal a recomputed " +
    "aggregate — one pass, no rescan") {
    val toks = split(col("text"), " ")
    val gated = Tables.documents(spark, sf)
      .withColumn("n_tokens", size(toks))
      .withColumn("unique_ratio",
        size(array_distinct(toks)).cast("double") / col("n_tokens"))
      .where(col("n_tokens") >= graft.text.TextAnalysis.MinTokens &&
        col("unique_ratio") >= graft.text.TextAnalysis.MinUniqueRatio)
    val (observed, obs) =
      Observability.countAndSums(gated, "curation_gate", "n_tokens")
    // the metrics ride THIS action — no second scan anywhere
    val materialized = observed.count()
    val m = obs.get
    assert(m("n_rows") === materialized)
    // ground truth via an independent aggregation
    val truth = gated.agg(count(lit(1)), sum(col("n_tokens"))).head
    assert(m("n_rows") === truth.getLong(0))
    assert(m("sum_n_tokens") === truth.getLong(1))
  }

  test("the observed frame is plan-identical: metrics don't add a " +
    "shuffle or change the row set") {
    val base = Tables.documents(spark, sf).select(col("doc_id"))
    val (observed, obs) =
      Observability.countAndSums(base, "passthrough")
    assert(observed.collect().map(_.getLong(0)).sorted
      === base.collect().map(_.getLong(0)).sorted)
    assert(obs.get("n_rows") === base.count())
    val p = observed.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"observe() introduced a shuffle:\n$p")
  }
}
