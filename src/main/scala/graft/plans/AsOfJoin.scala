package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** The engine's whole-operator custom-Catalyst surface: a NATIVE as-of
  * join — `LogicalPlan` node + `SparkStrategy` + physical `SparkPlan` —
  * injected through `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]]).
  *
  * Semantics (LEFT as-of): every left row, enriched with the columns of
  * the LATEST right row sharing its key(s) with `rightTs <= leftTs`;
  * left rows with no such right row keep nulls — exactly DuckDB's
  * `ASOF LEFT JOIN … ON l.k = r.k AND r.ts <= l.ts` (multi-column keys
  * map to additional equality conditions), the enrichment shape the
  * reference's split snapshot/delta streams exist for
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
  * Hot-path evaluation is BOUND + CODEGEN'D (the round-9 version paid
  * interpreted `Expression.eval` + interpreted orderings per row): keys
  * and timestamps are extracted through `UnsafeProjection.create`
  * (whole-expression codegen into compact key rows) and compared with
  * `RowOrdering.create` (codegen'd ordering with interpreted fallback),
  * so the merge loop touches UnsafeRow field accessors only.
  *
  * Registered as `ob29_asof_native` (single key) and
  * `ob34_asof_composite` ((ticker, side) key) with DuckDB ASOF
  * oracles. */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    strict: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output.map(AsOfJoinNode.clean) ++
      right.output.map(a => AsOfJoinNode.clean(a).withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {
  /** Metadata key marking the re-aliasing Project the builder wraps
    * around the right child for attribute-id disambiguation. Spark's
    * `RemoveRedundantAliases` strips same-name, metadata-free aliases
    * for every node except the built-in Join — for a SELF as-of with
    * unrenamed columns that would collapse the right side back onto
    * the left side's expr ids and silently mirror left values into the
    * right half. An alias whose metadata differs from its child's is
    * never considered redundant, so this marker makes the
    * disambiguation survive optimization; the node strips it from its
    * own output so the marker never leaks into a result schema. */
  val RealiasMarker = "__graft_asof_realias"

  def clean(a: Attribute): Attribute =
    if (a.metadata.contains(RealiasMarker)) {
      a.withMetadata(new MetadataBuilder().withMetadata(a.metadata)
        .remove(RealiasMarker).build())
    } else a

  def mark(m: Metadata): Metadata =
    new MetadataBuilder().withMetadata(m)
      .putBoolean(RealiasMarker, value = true).build()

  private def attrOf(p: LogicalPlan, name: String): Attribute =
    p.output.filter(_.name == name) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"as-of input has no column '$name' (has: ${p.output.map(_.name).mkString(", ")})")
      case many =>
        // an ambiguous input (e.g. an unaliased self-join) must fail at
        // construction — find() would silently bind an arbitrary one
        throw new IllegalArgumentException(
          s"as-of input has ${many.size} columns named '$name' — " +
            "disambiguate with aliases before the join")
    }

  /** Node construction from two ANALYZED child plans — the one shared
    * core behind the DataFrame API ([[org.apache.spark.sql
    * .GraftPlanBridge]]) and the SQL table function ([[AsOfSql]]):
    * re-aliases the right child to fresh, marker-protected attribute
    * ids, resolves key/ts names, and fails fast on type mismatches
    * (the merge compares with ONE ordering per role — a mismatch must
    * fail at construction, not as a ClassCastException in a task). */
  def build(lp: LogicalPlan, rp0: LogicalPlan,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String, strict: Boolean): AsOfJoinNode = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"as-of key lists must be non-empty and same-length: " +
        s"$leftKeys vs $rightKeys")
    val rp = org.apache.spark.sql.catalyst.plans.logical.Project(
      rp0.output.map(a =>
        org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)(
          explicitMetadata = Some(mark(a.metadata)))), rp0)
    val lks = leftKeys.map(attrOf(lp, _))
    val rks = rightKeys.map(attrOf(rp, _))
    val (lt, rt) = (attrOf(lp, leftTs), attrOf(rp, rightTs))
    leftKeys.lazyZip(rightKeys).lazyZip(lks.lazyZip(rks).toSeq).foreach {
      case (ln, rn, (la, ra)) =>
        require(la.dataType == ra.dataType,
          s"as-of key types differ: $ln ${la.dataType} vs $rn ${ra.dataType}")
    }
    require(lt.dataType == rt.dataType,
      s"as-of ts types differ: $leftTs ${lt.dataType} vs $rightTs ${rt.dataType}")
    AsOfJoinNode(lp, rp, lks, rks, lt, rt, strict)
  }
}

/** Planner strategy: the one-case mapping from the logical node to the
  * physical exec, with `planLater` children (Catalyst plans the inputs;
  * only the as-of merge itself is custom). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lks, rks, lts, rts, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lks, rks, lts, rts,
        strict) :: Nil
    case _ => Nil
  }
}

/** Physical partitioned merge as-of join.
  *
  * Contract with the engine: `requiredChildDistribution` clusters both
  * children on their keys (EnsureRequirements inserts compatible hash
  * exchanges — or none, when an upstream partitioning already
  * satisfies them); `requiredChildOrdering` asks for (keys…, ts)
  * ascending on both sides (satisfied by SortExec, or for free off a
  * sorted source). `doExecute` then zips co-partitioned inputs and
  * merges each pair with ONE forward pass: a buffered right iterator
  * is advanced while it is still at-or-before the current left row,
  * remembering only the latest same-key right row (copied out of the
  * reused UnsafeRow buffer). Null key columns / timestamps never
  * match, on either side — SQL join-key semantics. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
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
    left.output.map(AsOfJoinNode.clean) ++
      right.output.map(a => AsOfJoinNode.clean(a).withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  // the merge emits left rows in their incoming order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val rightArity = right.output.size
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatchedRows")
    val (lks, rks, lts, rts) = (leftKeys, rightKeys, leftTs, rightTs)
    val (lOut, rOut, out) = (left.output, right.output, output)
    val isStrict = strict
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      // bound, codegen'd extractors: each evaluates its expressions
      // against the child's UnsafeRow into a compact key/ts row —
      // generated once per partition, no per-row interpretation
      val lKeyProj = UnsafeProjection.create(lks, lOut)
      val rKeyProj = UnsafeProjection.create(rks, rOut)
      val lTsProj = UnsafeProjection.create(lts :: Nil, lOut)
      val rTsProj = UnsafeProjection.create(rts :: Nil, rOut)
      // codegen'd natural-ascending orderings over the projected rows
      // (null ordering is irrelevant: null keys/ts short-circuit below)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(tsType :: Nil)
      val rbuf = rit.buffered
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      // SparkPlan's execute() contract expects UnsafeRow output (a
      // collect directly over this node crashes on a raw JoinedRow);
      // the result projection also frees downstream operators from
      // JoinedRow's slower field access — same shape as SMJ's
      // resultProj
      val proj = UnsafeProjection.create(out, out)
      // O(1) merge state: the latest at-or-before right row and its
      // key row (copies — both the child iterator and the projections
      // reuse their UnsafeRow buffers)
      var held: InternalRow = null
      var heldKey: InternalRow = null
      lit.map { lrow =>
        val lk = lKeyProj(lrow)
        val lt = lTsProj(lrow)
        if (lk.anyNull || lt.isNullAt(0)) {
          outRows += 1
          proj(joined(lrow, nullRight))
        } else {
          var scanning = true
          while (scanning && rbuf.hasNext) {
            val rrow = rbuf.head
            val rk = rKeyProj(rrow)
            val rt = rTsProj(rrow)
            if (rk.anyNull || rt.isNullAt(0)) { rbuf.next() } // unmatchable
            else {
              val kc = keyOrd.compare(rk, lk)
              val tc = tsOrd.compare(rt, lt)
              if (kc < 0 || (kc == 0 && (if (isStrict) tc < 0 else tc <= 0))) {
                if (kc == 0) {
                  held = rrow.copy()
                  heldKey = rk.copy()
                }
                rbuf.next()
              } else scanning = false
            }
          }
          val matched = held != null && keyOrd.compare(heldKey, lk) == 0
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
  /** Single-key convenience — the common ticker-keyed shape. */
  def join(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      strict: Boolean): org.apache.spark.sql.DataFrame =
    join(left, right, Seq(leftKey), Seq(rightKey), leftTs, rightTs, strict)

  def join(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): org.apache.spark.sql.DataFrame =
    join(left, right, Seq(leftKey), Seq(rightKey), leftTs, rightTs,
      strict = false)

  /** Composite-key as-of: equality on every (leftKeys(i), rightKeys(i))
    * pair, then latest-at-or-before on the ts pair — the (ticker, side)
    * book shape ob34 registers. `strict = true` matches STRICTLY-before
    * right rows (`rightTs < leftTs`) — the "prevailing quote must
    * predate the anchor" mode (ob19/ob23's semantics); default is
    * at-or-before (`<=`). */
  def join(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String,
      strict: Boolean = false): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.GraftPlanBridge.asofJoin(
      left, right, leftKeys, rightKeys, leftTs, rightTs, strict)

  /** True when `spark` was built with the graft extensions (the
    * strategy is injected); callers outside GraftSession would
    * otherwise fail at planning with "no plan for AsOfJoinNode". */
  def available(spark: SparkSession): Boolean =
    spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)
}
