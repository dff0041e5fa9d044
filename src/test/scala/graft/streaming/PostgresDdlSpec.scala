package graft.streaming

import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.{Fixtures, Normalize}

/** A13 dialect parity, no live DB: the DDL [[JdbcSink]] hands every
  * JDBC backend must say exactly what the reference's
  * `initialize_schema` says (postgres_client.py:26-51) — column names,
  * order, and types. NOT NULL is not part of the column-type string:
  * Spark appends it per column from the DataFrame's nullability at
  * write time. */
class PostgresDdlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  // postgres_client.py:28-37 / :39-49, verbatim
  private val referenceSnapshots =
    """CREATE TABLE IF NOT EXISTS orderbook_snapshots (
      |    timestamp BIGINT NOT NULL,
      |    ticker VARCHAR(50) NOT NULL,
      |    side VARCHAR(10) NOT NULL,
      |    price_dollars DECIMAL(5, 4) NOT NULL,
      |    contracts INTEGER NOT NULL,
      |    redis_stream_id VARCHAR(50) NOT NULL
      |)""".stripMargin
  private val referenceDeltas =
    """CREATE TABLE IF NOT EXISTS orderbook_deltas (
      |    timestamp BIGINT NOT NULL,
      |    ticker VARCHAR(50) NOT NULL,
      |    side VARCHAR(10) NOT NULL,
      |    price_dollars DECIMAL(5, 4) NOT NULL,
      |    delta INTEGER NOT NULL,
      |    redis_stream_id VARCHAR(50) NOT NULL
      |)""".stripMargin

  private def normalize(ddl: String): String =
    ddl.replaceAll("NOT NULL", "").replaceAll("\\s+", " ")
      .replaceAll("\\(\\s*", "(").replaceAll("\\s*\\)", ")")
      .replaceAll("\\s*,\\s*", ",").trim

  test("generated CREATE TABLE matches the reference DDL (both tables)") {
    assert(normalize(JdbcSink.createTableSql(
        "orderbook_snapshots", JdbcSink.snapshotColumnTypes)) ===
      normalize(referenceSnapshots))
    assert(normalize(JdbcSink.createTableSql(
        "orderbook_deltas", JdbcSink.deltaColumnTypes)) ===
      normalize(referenceDeltas))
  }

  test("column DDL parses and lines up with the fact frames' schemas") {
    val deltaDdl = StructType.fromDDL(JdbcSink.deltaColumnTypes)
    val facts = Normalize.flattenDeltas(
      Normalize.parseDeltaEntries(Fixtures.deltaEntries(spark)))
    assert(deltaDdl.fieldNames.toSeq === facts.schema.fieldNames.toSeq)
    // the decimal that must survive to cents-exact storage
    assert(facts.schema("price_dollars").dataType === DecimalType(5, 4))
    val snapDdl = StructType.fromDDL(JdbcSink.snapshotColumnTypes)
    val snaps = Normalize.explodeSnapshots(
      Normalize.parseSnapshotEntries(Fixtures.snapshotEntries(spark)))
    assert(snapDdl.fieldNames.toSeq === snaps.schema.fieldNames.toSeq)
  }

  test("Postgres dialect defaults motivate the explicit DDL") {
    val pg = JdbcDialects.get("jdbc:postgresql://example/db")
    // left to the dialect (common JDBC fallback where it doesn't
    // override), strings become TEXT — not the reference's
    // VARCHAR(50); the explicit createTableColumnTypes is load-bearing
    def pgType(dt: DataType): String =
      pg.getJDBCType(dt)
        .orElse(JdbcUtils.getCommonJDBCType(dt))
        .get.databaseTypeDefinition
    assert(pgType(StringType) === "TEXT")
    assert(pgType(IntegerType) === "INTEGER")
  }
}
