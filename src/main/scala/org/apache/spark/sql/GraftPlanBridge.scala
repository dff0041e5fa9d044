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
    * row with the same key and rightTs <= leftTs (nulls when none).
    * The right child is re-aliased to fresh attribute ids so the two
    * sides may share a scan (self-as-of) without conflicting ids. */
  def asofJoin(left: Dataset[Row], right: Dataset[Row],
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      strict: Boolean = false): DataFrame = {
    val l = left.asInstanceOf[CDataset[Row]]
    val r = right.asInstanceOf[CDataset[Row]]
    val lp = l.queryExecution.analyzed
    val rp0 = r.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    val (lk, rk) = (attrOf(lp, leftKey), attrOf(rp, rightKey))
    val (lt, rt) = (attrOf(lp, leftTs), attrOf(rp, rightTs))
    // the merge compares with ONE interpreted ordering per role — a
    // type mismatch must fail here, not as a ClassCastException inside
    // a task
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: $leftKey ${lk.dataType} vs $rightKey ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of ts types differ: $leftTs ${lt.dataType} vs $rightTs ${rt.dataType}")
    val node = AsOfJoinNode(lp, rp, lk, rk, lt, rt, strict)
    CDataset.ofRows(l.sparkSession.asInstanceOf[CSparkSession], node)
  }
}
