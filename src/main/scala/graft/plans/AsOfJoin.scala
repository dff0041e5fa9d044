package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The engine's whole-operator custom-Catalyst surface: a NATIVE as-of
  * join — `LogicalPlan` node + `SparkStrategy` + physical `SparkPlan` —
  * injected through `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]]).
  *
  * Semantics (LEFT as-of): every left row, enriched with the columns of
  * the LATEST right row sharing its key with `rightTs <= leftTs`; left
  * rows with no such right row keep nulls — exactly DuckDB's
  * `ASOF LEFT JOIN … ON l.k = r.k AND r.ts <= l.ts`, the enrichment
  * shape the reference's split snapshot/delta streams exist for
  * (`consumer.py:24-27` processes them independently; answering
  * "prevailing quote at each anchor" NEEDS this join).
  *
  * Why a custom operator when ob14 already composes the semantics from
  * built-ins: the composed route pays a union + bucket summaries + a
  * prefix window + a local window over the unioned stream — ~5 logical
  * stages, because Spark has no as-of primitive to say directly. The
  * native operator says it directly: ONE hash exchange per side on the
  * key (the minimum any key-correct as-of can do), ONE (key, ts) sort
  * per side (what SortMergeJoin pays), then a single forward merge pass
  * per partition — O(1) state (ONE held right row), no window frames,
  * no bucket machinery, streaming-friendly spill profile (both inputs
  * iterate forward exactly once). `EnsureRequirements` inserts the
  * exchanges/sorts from the declared distribution/ordering, so AQE,
  * partition-count tuning, and reuse all apply unchanged — the operator
  * composes with the engine instead of bypassing it.
  *
  * Scale: partitions = key hash space (tickers at 100 TB: millions of
  * keys spread over executors); per-partition memory is one right row —
  * the operator never buffers a key group, unlike the window route
  * whose RANGE frame must hold a bucket. Skew on a hot key degrades to
  * the sort cost of that key's partition, same as SMJ, and the AQE
  * skew-split machinery (op05) applies to the exchanges it reads.
  *
  * Registered as `ob29_asof_native` with ob14's oracle (two
  * implementations — composed vs native — one DuckDB ASOF truth). */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    strict: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: the one-case mapping from the logical node to the
  * physical exec, with `planLater` children (Catalyst plans the inputs;
  * only the as-of merge itself is custom). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts,
        strict) :: Nil
    case _ => Nil
  }
}

/** Physical partitioned merge as-of join.
  *
  * Contract with the engine: `requiredChildDistribution` clusters both
  * children on their key (EnsureRequirements inserts compatible hash
  * exchanges — or none, when an upstream partitioning already
  * satisfies them); `requiredChildOrdering` asks for (key, ts)
  * ascending on both sides (satisfied by SortExec, or for free off a
  * sorted source). `doExecute` then zips co-partitioned inputs and
  * merges each pair with ONE forward pass: a buffered right iterator
  * is advanced while it is still at-or-before the current left row,
  * remembering only the latest same-key right row (copied out of the
  * reused UnsafeRow buffer). Null keys/timestamps never match, on
  * either side — SQL join-key semantics. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    strict: Boolean = false) extends BinaryExecNode {

  // production operators report themselves: row counts and the
  // match rate (unmatched anchors are the "stale enrichment" signal
  // an as-of pipeline monitors) surface in the Spark UI / listeners
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // the merge emits left rows in their incoming order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltsB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightArity = right.output.size
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatchedRows")
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val rbuf = rit.buffered
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      // SparkPlan's execute() contract expects UnsafeRow output (a
      // collect directly over this node crashes on a raw JoinedRow);
      // the result projection also frees downstream operators from
      // JoinedRow's slower field access — same shape as SMJ's
      // resultProj
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(output, output)
      // O(1) merge state: the latest at-or-before right row (a copy —
      // the child iterator reuses its UnsafeRow buffer) and its key,
      // re-evaluated from the copy so backing memory stays valid
      var held: InternalRow = null
      var heldKey: Any = null
      lit.map { lrow =>
        val k = lkB.eval(lrow)
        val t = ltsB.eval(lrow)
        if (k == null || t == null) {
          outRows += 1
          proj(joined(lrow, nullRight))
        } else {
          var scanning = true
          while (scanning && rbuf.hasNext) {
            val rrow = rbuf.head
            val rk = rkB.eval(rrow)
            val rt = rtsB.eval(rrow)
            if (rk == null || rt == null) { rbuf.next() } // unmatchable
            else {
              val kc = keyOrd.compare(rk, k)
              val tc = tsOrd.compare(rt, t)
              if (kc < 0 || (kc == 0 && (if (strict) tc < 0 else tc <= 0))) {
                if (kc == 0) {
                  held = rrow.copy()
                  heldKey = rkB.eval(held)
                }
                rbuf.next()
              } else scanning = false
            }
          }
          val matched = held != null && keyOrd.compare(heldKey, k) == 0
          outRows += 1
          if (matched) matchedRows += 1
          proj(joined(lrow, if (matched) held else nullRight))
        }
      }
    }
  }
}

/** Declarative entry: `AsOf.join(left, right, …)` builds the logical
  * node from two DataFrames (right side re-aliased to fresh attribute
  * ids — the children may share a scan, and a self-join must not carry
  * conflicting ids into the node). Lives behind the sql-package bridge
  * because constructing a DataFrame from a raw LogicalPlan is a
  * package-private Spark door. */
object AsOf {
  /** `strict = true` matches STRICTLY-before right rows (`rightTs <
    * leftTs`) — the "prevailing quote must predate the anchor" mode
    * (ob19/ob23's semantics); default is at-or-before (`<=`). */
  def join(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      strict: Boolean = false): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.GraftPlanBridge.asofJoin(
      left, right, leftKey, rightKey, leftTs, rightTs, strict)

  /** True when `spark` was built with the graft extensions (the
    * strategy is injected); callers outside GraftSession would
    * otherwise fail at planning with "no plan for AsOfJoinNode". */
  def available(spark: SparkSession): Boolean =
    spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)
}
