package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every query is a
  * `(SparkSession, sfDir) => DataFrame` over the parquet tables in sfDir;
  * `oracleSql` carries the DuckDB-equivalent SQL for hash comparison
  * (column names must match exactly — see module scaladoc for the
  * determinism rules that make the hashes comparable).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * B1 order-book reconstruction — the minimum end-to-end slice of
    * SURVEY.md §7.2: derive → explode → window/agg → full-outer combine. */
  def entry(spark: SparkSession): DataFrame =
    orderbook.Analytics.bookAsOf(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(relational.Relational.queries ++
      relational.Advanced.queries ++
      relational.Maintenance.queries ++
      orderbook.Analytics.queries ++
      text.TextAnalysis.queries ++
      dedup.Dedup.queries ++
      similarity.Similarity.queries ++
      multimodal.Multimodal.queries ++
      streaming.StreamedQueries.queries ++
      operators.Salting.queries ++
      operators.Sampling.queries ++
      operators.Pruning.queries ++
      operators.Bucketed.queries ++
      operators.Reuse.queries ++
      operators.Observability.queries ++
      operators.RuntimeFilter.queries ++
      operators.Skyline.queries: _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(relational.Relational.oracles ++
      relational.Advanced.oracles ++
      relational.Maintenance.oracles ++
      orderbook.Analytics.oracles ++
      text.TextAnalysis.oracles ++
      dedup.Dedup.oracles ++
      similarity.Similarity.oracles ++
      multimodal.Multimodal.oracles ++
      streaming.StreamedQueries.oracles ++
      operators.Salting.oracles ++
      operators.Sampling.oracles ++
      operators.Pruning.oracles ++
      operators.Bucketed.oracles ++
      operators.Reuse.oracles ++
      operators.Observability.oracles ++
      operators.RuntimeFilter.oracles ++
      operators.Skyline.oracles: _*)
}
