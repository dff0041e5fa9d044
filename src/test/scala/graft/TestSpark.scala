package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (per-suite sessions would pay
  * SparkContext startup repeatedly; Spark reuses the active context). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()
  def init(): SparkSession = { spark.sparkContext.setLogLevel("WARN"); spark }
}
