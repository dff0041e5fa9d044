package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink — unlike `count()`, which
  * Catalyst can collapse to a metadata-ish scan for pure projections, noop
  * materializes every output row, so timings reflect the real plan. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Warm the JVM/codegen/IO paths once so query #1 doesn't absorb all
    // the session startup cost.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $sec%8.2f s")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
