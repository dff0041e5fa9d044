package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** Raw events table. The driver has shipped `ts` as either INT64 nanos
    * (TIMESTAMP(NANOS) parquet read via spark.sql.legacy.parquet.nanosAsLong)
    * or a plain TIMESTAMP/TIMESTAMP_NTZ in micros — the loader must not
    * assume one. */
  def eventsRaw(s: SparkSession, d: String): DataFrame  = load(s, d, "events")

  /** Events with `ts` normalized to a millisecond TIMESTAMP and `ts_ms`
    * epoch millis (matches DuckDB's epoch_ms(ts) exactly). Branches on the
    * LOADED dtype: INT64 nanos uses integer `div` (a double roundtrip would
    * lose precision above 2^53); timestamp types use unix_millis under the
    * pinned UTC session, where the NTZ→LTZ cast is wall-clock-identical to
    * DuckDB's naive-timestamp epoch_ms. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = eventsRaw(s, d)
    val tsMs = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000000")
      case _: TimestampType | _: TimestampNTZType => epochMs(col("ts"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — update Tables.events")
    }
    raw
      .withColumn("ts_ms", tsMs)
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }

  /** Epoch millis from a (possibly NTZ) timestamp column. Session timezone
    * is pinned to UTC so the NTZ→LTZ cast is wall-clock-identical to
    * DuckDB's naive-timestamp epoch_ms. */
  def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
