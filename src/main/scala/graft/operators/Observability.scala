package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability via Spark's `observe()` (CollectMetrics):
  * named aggregate metrics computed ON the rows flowing through a
  * stage, during the job that runs it — no second pass over the data,
  * no extra action, no sampling. This is how a production curation
  * pipeline reports drop rates and token budgets per run: a filter
  * stage observed with (rows_in, rows_out, tokens_out) costs one
  * map-side accumulator merge, where a monitoring re-query would
  * rescan the corpus.
  *
  * The metrics ride the existing action: `Observation.get` blocks
  * until the first action on the observed frame completes, then
  * returns the exact aggregate values — consistent with the rows the
  * job actually processed (an AQE re-plan or task retry can't skew
  * them; Spark dedupes by task attempt).
  */
object Observability {

  /** Attach a row-count + per-column-sum probe to a stage boundary.
    * Returns the observed frame (plan-identical rows) and the handle
    * to read after the next action. */
  def countAndSums(df: DataFrame, name: String, sumCols: String*)
      : (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
