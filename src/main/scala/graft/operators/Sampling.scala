package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic corpus sampling — the dataset-curation step every
  * training-data pipeline runs between dedup and training: cut each
  * stratum (language here) to a budget WITHOUT an order-by, a
  * shuffle, or an RNG whose draw depends on partitioning.
  *
  * The keep decision is a pure function of the row: an engine-neutral
  * multiplicative hash of the key compared against the stratum's rate
  * threshold. That makes the sample (a) reproducible bit-for-bit
  * across engines (the DuckDB oracle spells the same arithmetic —
  * Spark's own `hash()`/`rand()` are engine-private), (b) a NARROW
  * filter at scale — the corpus is never shuffled; only the
  * strata-count aggregate (|langs| rows) moves, broadcast back — and
  * (c) stable under re-runs and appends: a doc's verdict never depends
  * on which partition or executor saw it (`TABLESAMPLE`/`rand()`
  * resample on every retry; hash sampling is how production pipelines
  * pin train-set membership).
  *
  * The reference has no sampling stage (it ships everything to
  * Postgres); this generalizes its per-row pipeline to the budgeted
  * form a 100 TB corpus needs. */
object Sampling {

  /** Per-language document budget: strata at-or-under it keep
    * everything (rate 1); over it are hash-thinned to ≈budget docs in
    * expectation. */
  val BudgetPerLang = 50.0

  /** Engine-neutral hash: multiplicative mix into a prime field —
    * spellable identically in Spark and DuckDB (both BIGINT-exact at
    * this magnitude). Same family as st02's KMV hash. */
  private val HashMod = 1000003L

  /** op12 — stratified hash sampling: per-lang rate = min(1, B/n), a
    * doc keeps iff h(doc_id) falls under rate·M. Plan shape: one tiny
    * per-stratum count (broadcast back) + one narrow filter — the
    * sampled corpus never shuffles. Output is the full sample
    * membership (the strongest checkable artifact — the oracle must
    * reproduce the exact same doc set, not just the counts). */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val rates = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .select(col("lang"),
        least(lit(1.0), lit(BudgetPerLang) / col("n").cast("double"))
          .as("rate"))
    // doc_id is reduced mod HashMod BEFORE the multiply: the raw
    // product doc_id·2654435761 overflows signed 64-bit at
    // doc_id ≈ 3.5e9 (Spark would wrap, DuckDB would error) — the
    // reduced form is congruent mod HashMod, so the keep-set is
    // unchanged, and (HashMod-1)·(2654435761 mod HashMod) ≈ 4.3e11
    // stays exact in both engines at any doc_id.
    docs.join(broadcast(rates), "lang")
      .where((col("doc_id") % HashMod * (2654435761L % HashMod)
          + 99991L) % HashMod <
        floor(col("rate") * HashMod).cast("long"))
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  val stratifiedSampleSql: String =
    s"""WITH rates AS (
       |  SELECT lang, LEAST(1.0, ${BudgetPerLang} / COUNT(*)) AS rate
       |  FROM documents GROUP BY lang)
       |SELECT d.lang, d.doc_id
       |FROM documents d JOIN rates r USING (lang)
       |WHERE (d.doc_id % ${HashMod} * (2654435761 % ${HashMod})
       |    + 99991) % ${HashMod}
       |  < CAST(FLOOR(r.rate * ${HashMod}) AS BIGINT)
       |ORDER BY d.lang, d.doc_id""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq("op12_stratified_sample" -> (stratifiedSample _))

  val oracles: Seq[(String, String)] =
    Seq("op12_stratified_sample" -> stratifiedSampleSql)
}
