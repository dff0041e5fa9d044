package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, StringType}

/** SQL surface for the native as-of join — the `graft_asof` TABLE
  * FUNCTION, so the operator is reachable from pure SQL text exactly
  * like DuckDB's `ASOF JOIN` is (a user of the reference's analytic
  * stack lives in SQL; an operator only reachable from Scala is only
  * half an operator):
  *
  * {{{
  * SELECT * FROM graft_asof(
  *   'trades', 'quotes',        -- left/right table or view names
  *   'ticker', 'q_ticker',      -- equality keys ('a,b' = composite)
  *   'ts', 'q_ts')              -- as-of timestamp pair
  * -- optional 7th arg: true = strict (rightTs < leftTs)
  * }}}
  *
  * Two-phase resolution, the idiomatic Catalyst shape for a TVF whose
  * output schema depends on other relations: the registered builder
  * (SessionCatalog's TableFunctionRegistry via `injectTableFunction` —
  * the sixth extension-point surface this engine exercises) only
  * PARSES its literal arguments and returns an unresolved
  * [[AsOfSqlNode]] over `UnresolvedRelation` children; the injected
  * resolution rule ([[AsOfSqlResolution]]) waits until the analyzer
  * has resolved both children (temp views, catalog tables — the
  * relation-lookup machinery comes for free) and then runs the SAME
  * [[AsOfJoinNode.build]] core as the DataFrame API. No nested
  * analysis, no session capture in the builder. */
object AsOfSql {

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"graft_asof: $what must be a string literal, got $other")
  }

  /** The TableFunctionRegistry builder: literal args → unresolved
    * intermediate node. Names may be 'a,b'-composite for the keys and
    * dotted for the relations. */
  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 6 || args.size == 7,
      "graft_asof(left, right, leftKeys, rightKeys, leftTs, rightTs" +
        s"[, strict]) takes 6 or 7 arguments, got ${args.size}")
    val strict = if (args.size == 7) args(6) match {
      case Literal(b: Boolean, BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"graft_asof: strict must be a boolean literal, got $other")
    } else false
    def rel(e: Expression, what: String) =
      UnresolvedRelation(strArg(e, what).split('.').toSeq)
    def keys(e: Expression, what: String) =
      strArg(e, what).split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    AsOfSqlNode(rel(args(0), "left"), rel(args(1), "right"),
      keys(args(2), "leftKeys"), keys(args(3), "rightKeys"),
      strArg(args(4), "leftTs"), strArg(args(5), "rightTs"), strict)
  }
}

/** Intermediate unresolved node between the TVF builder and
  * [[AsOfSqlResolution]]: never reports resolved, so an analysis where
  * the rule cannot fire (rule not injected, children unresolvable)
  * fails loudly instead of planning a half-built join. */
case class AsOfSqlNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[String], rightKeys: Seq[String],
    leftTs: String, rightTs: String, strict: Boolean) extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfSqlNode =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule (injected via `injectResolutionRule`): once both
  * children are resolved, lower [[AsOfSqlNode]] through the shared
  * [[AsOfJoinNode.build]] core — the same re-aliasing, name
  * resolution, and fail-fast type checks the DataFrame API gets. */
case class AsOfSqlResolution(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case AsOfSqlNode(l, r, lks, rks, lts, rts, strict)
          if l.resolved && r.resolved =>
        AsOfJoinNode.build(l, r, lks, rks, lts, rts, strict)
    }
}
