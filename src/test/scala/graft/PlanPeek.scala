package graft

/** Ad-hoc plan dump helper for development: prints the executed plan of
  * one registry query at sf0.001. Not part of the test suite. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.init()
    val name = if (args.nonEmpty) args(0) else "sim01_cosine_topk"
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
