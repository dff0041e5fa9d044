package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
