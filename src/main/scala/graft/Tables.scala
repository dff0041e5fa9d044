package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst's predicate pushdown /
  * column pruning reach the scan — callers `select`/`filter` and the parquet
  * reader only materializes what the query needs. At 100 TB these would be
  * partitioned/bucketed catalog tables; the call-sites stay identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Raw events table: `ts` arrives as INT64 nanos (the parquet is
    * TIMESTAMP(NANOS), read via spark.sql.legacy.parquet.nanosAsLong). */
  def eventsRaw(s: SparkSession, d: String): DataFrame  = load(s, d, "events")

  /** Events with `ts` normalized to a millisecond TIMESTAMP and `ts_ms`
    * epoch millis (matches DuckDB's epoch_ms(ts) exactly — `div` keeps the
    * ns→ms truncation in integer space; a double roundtrip would lose
    * precision above 2^53). */
  def events(s: SparkSession, d: String): DataFrame =
    eventsRaw(s, d)
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("ts", timestamp_millis(col("ts_ms")))

  /** Epoch millis from a (possibly NTZ) timestamp column. Session timezone
    * is pinned to UTC so the NTZ→LTZ cast is wall-clock-identical to
    * DuckDB's naive-timestamp epoch_ms. */
  def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
