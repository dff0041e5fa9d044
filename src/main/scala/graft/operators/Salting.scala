package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Skew mitigation for hot keys. AQE's skew-join handles sort-merge
  * skew at runtime; explicit salting is the planned-ahead variant for
  * aggregations and broadcast-averse joins where one key holds a
  * disproportionate share of rows (e.g. `lang='en'` is ~41% of the
  * documents corpus).
  *
  * Both transforms are deterministic: the salt comes from a stable
  * row attribute, never `rand()`, so replays and retries produce
  * identical partitioning.
  */
object Salting {

  /** Two-phase aggregation: group on (key, salt) first — S× more
    * shuffle keys, so the hot key's rows spread over S reducers — then
    * re-aggregate the aliased partials on the key alone. The partial
    * aggregates must be algebraic (sum/count/min/max style) so the two
    * phases compose; e.g.
    * `saltedAgg(docs, col("lang"), col("doc_id"), 8,
    *    Seq(count(lit(1)).as("n")), Seq(sum("n").as("n")))`. */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, salts: Int,
      partials: Seq[Column], reAggs: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(saltSource, lit(salts)))
      .groupBy(key, col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .drop("__salt")
      .groupBy(key)
      .agg(reAggs.head, reAggs.tail: _*)

  /** Salted fact⋈dim equi-join: the fact side gets a deterministic salt
    * in [0, salts); the dim side is replicated once per salt value via
    * explode. The join key becomes (key, salt) — the hot key's rows
    * land on `salts` different reducers instead of one. Result set is
    * identical to the unsalted join (each fact row still matches its
    * dim row exactly once). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(saltSource, lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  // ------------------------------------------------- oracle-gated twins
  /** op01: the salted two-phase aggregation under the correctness gate —
    * its contract is bit-identical output to a plain GROUP BY (the
    * oracle IS the plain GROUP BY), checked on the skewed `lang` key
    * (en ≈ 41% of the corpus). */
  def saltedLangStats(s: SparkSession, d: String): DataFrame =
    saltedAgg(
      Tables.documents(s, d).select(col("lang"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tok")),
      col("lang"), col("doc_id"), 8,
      Seq(count(lit(1)).as("pn"), sum(col("n_tok")).as("pt")),
      Seq(sum(col("pn")).cast(LongType).as("n_docs"),
        sum(col("pt")).cast(LongType).as("n_tokens")))
      .orderBy(col("lang"))

  val saltedLangStatsSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |    AS n_tokens
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** op02: the salted fact⋈dim join under the gate — result set must be
    * identical to the unsalted join (each fact row matches its dim row
    * exactly once despite the dim replication). */
  def saltedDimJoin(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("lang"), col("doc_id"))
    val dim = docs.groupBy(col("lang"))
      .agg(min(col("doc_id")).as("lang_min_id"))
    saltedJoin(docs, dim, "lang", col("doc_id"), 8)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"), max(col("lang_min_id")).as("min_id"))
      .orderBy(col("lang"))
  }

  val saltedDimJoinSql: String =
    """WITH dim AS (
      |  SELECT lang, MIN(doc_id) AS lang_min_id FROM documents GROUP BY 1)
      |SELECT d.lang, COUNT(*) AS n_rows, MAX(m.lang_min_id) AS min_id
      |FROM documents d JOIN dim m ON d.lang = m.lang
      |GROUP BY d.lang
      |ORDER BY d.lang""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "op01_salted_agg" -> (saltedLangStats _),
    "op02_salted_join" -> (saltedDimJoin _))

  val oracles: Seq[(String, String)] = Seq(
    "op01_salted_agg" -> saltedLangStatsSql,
    "op02_salted_join" -> saltedDimJoinSql)
}
