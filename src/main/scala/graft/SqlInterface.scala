package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-text face of the engine: register every testdata table as a
  * temp view so `spark.sql("...")` works against the same data the
  * DataFrame API sees — including the graft_* native functions, which
  * resolve from SQL via [[graft.functions.GraftExtensions]] with no
  * imperative setup. */
object SqlInterface {

  /** One temp view per table in `dir` (see Tables.names). The `events`
    * view gets the same ts/ts_ms normalization every DataFrame query
    * sees via [[Tables.events]] (the raw INT64-nanos frame stays
    * reachable as `events_raw`), so the two API surfaces never show a
    * same-named table with different schemas. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    // register only the tables the corpus dir actually ships: partial
    // fixture dirs (degenerate-input suites) must be able to run the
    // SQL queries over the tables they DO provide, and a statement
    // touching a missing table still fails loudly at analysis with
    // TABLE_OR_VIEW_NOT_FOUND instead of here at registration
    Tables.names.foreach { t =>
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, s"$t.parquet")))
        Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "events.parquet"))) {
      Tables.events(spark, dir).createOrReplaceTempView("events")
      Tables.eventsRaw(spark, dir).createOrReplaceTempView("events_raw")
    }
  }

  /** Convenience: register views then run the statement. */
  def sql(spark: SparkSession, dir: String, statement: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(statement)
  }
}
