package graft.streaming

import java.util.Properties

import org.apache.spark.sql.DataFrame

/** A13/A14: the relational fact sink. The reference initializes two
  * Postgres tables with exact column types (postgres_client.py:26-51)
  * and bulk-appends columnar batches into them (postgres_client.py:
  * 53-67). Spark's JDBC writer picks dialect-default types unless
  * told otherwise (e.g. Postgres TEXT for strings, Derby CLOB), so
  * the reference's column DDL lives HERE, once, and every backend —
  * embedded Derby in tests, Postgres in production — gets identical
  * column types via `createTableColumnTypes`.
  */
object JdbcSink {

  /** orderbook_snapshots column DDL (postgres_client.py:28-37). */
  val snapshotColumnTypes: String =
    "timestamp BIGINT, ticker VARCHAR(50), side VARCHAR(10), " +
      "price_dollars DECIMAL(5,4), contracts INTEGER, " +
      "redis_stream_id VARCHAR(50)"

  /** orderbook_deltas column DDL (postgres_client.py:39-49). */
  val deltaColumnTypes: String =
    "timestamp BIGINT, ticker VARCHAR(50), side VARCHAR(10), " +
      "price_dollars DECIMAL(5,4), delta INTEGER, " +
      "redis_stream_id VARCHAR(50)"

  /** The full initialize-schema statement for a table — what the
    * reference's `initialize_schema` executes, reconstructed from the
    * same column list the writer uses (one source of truth). */
  def createTableSql(table: String, columnTypes: String): String =
    s"CREATE TABLE IF NOT EXISTS $table ($columnTypes)"

  /** A14: batched columnar append (the ADBC bulk insert's Spark twin;
    * batchsize plays adbc's chunk size). Creates the table with the
    * reference column types on first write. */
  def append(df: DataFrame, url: String, table: String,
      columnTypes: String, props: Properties,
      batchSize: Int = 100): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize.toString)
      .option("createTableColumnTypes", columnTypes)
      .jdbc(url, table, props)
}
