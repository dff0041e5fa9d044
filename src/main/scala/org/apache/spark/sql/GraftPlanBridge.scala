package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

import graft.plans.AsOfJoinNode

/** The one sql-package door the custom-plan surface needs: building a
  * DataFrame from a raw LogicalPlan (`Dataset.ofRows`) is
  * `private[sql]`, so the constructor for [[graft.plans.AsOfJoinNode]]
  * lives here. Nothing else reaches into Spark internals — the node,
  * strategy, and exec are plain public-API Catalyst classes. */
object GraftPlanBridge {

  private def attrOf(p: LogicalPlan, name: String): Attribute =
    p.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"as-of input has no column '$name' (has: ${p.output.map(_.name).mkString(", ")})"))

  /** Left as-of join: every left row + the columns of the latest right
    * row with the same key(s) and rightTs <= leftTs (nulls when none).
    * The right child is re-aliased to fresh attribute ids so the two
    * sides may share a scan (self-as-of) without conflicting ids. The
    * aliases carry [[AsOfJoinNode.RealiasMarker]] metadata: without it,
    * `RemoveRedundantAliases` (which special-cases only the built-in
    * Join node) strips these same-name aliases during optimization and
    * a same-name self-as-of collapses back to duplicate expr ids — the
    * result projection then binds right-half attributes to LEFT
    * ordinals and the right columns silently mirror left values. The
    * node strips the marker from its output attributes, so result
    * schemas stay clean. */
  def asofJoin(left: Dataset[Row], right: Dataset[Row],
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String,
      strict: Boolean): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"as-of key lists must be non-empty and same-length: " +
        s"$leftKeys vs $rightKeys")
    val l = left.asInstanceOf[CDataset[Row]]
    val r = right.asInstanceOf[CDataset[Row]]
    val lp = l.queryExecution.analyzed
    val rp0 = r.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)(
      explicitMetadata = Some(AsOfJoinNode.mark(a.metadata)))), rp0)
    val lks = leftKeys.map(attrOf(lp, _))
    val rks = rightKeys.map(attrOf(rp, _))
    val (lt, rt) = (attrOf(lp, leftTs), attrOf(rp, rightTs))
    // the merge compares with ONE ordering per role — a type mismatch
    // must fail here, not as a ClassCastException inside a task
    leftKeys.lazyZip(rightKeys).lazyZip(lks.lazyZip(rks).toSeq).foreach {
      case (ln, rn, (la, ra)) =>
        require(la.dataType == ra.dataType,
          s"as-of key types differ: $ln ${la.dataType} vs $rn ${ra.dataType}")
    }
    require(lt.dataType == rt.dataType,
      s"as-of ts types differ: $leftTs ${lt.dataType} vs $rightTs ${rt.dataType}")
    val node = AsOfJoinNode(lp, rp, lks, rks, lt, rt, strict)
    CDataset.ofRows(l.sparkSession.asInstanceOf[CSparkSession], node)
  }
}
