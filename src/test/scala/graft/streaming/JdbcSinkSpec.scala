package graft.streaming

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.{Fixtures, Normalize}

/** A13/A14: the reference's relational sink (Postgres DDL + columnar
  * bulk append, postgres_client.py:24-67) exercised offline against
  * embedded Derby — same `df.write.jdbc` / `spark.read.jdbc` code path
  * a cluster would use, batched writes per partition. */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  test("fact-table JDBC round trip: append, read back, types survive") {
    val dir = Files.createTempDirectory("graft-derby")
    val url = s"jdbc:derby:${dir.resolve("db")};create=true"
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

    val facts = Normalize.flattenDeltas(
      Normalize.parseDeltaEntries(Fixtures.deltaEntries(spark)))
    // A13: the reference's column DDL (postgres_client.py:41-48) via
    // createTableColumnTypes (Derby would otherwise map strings to
    // CLOB, which is not even comparable); A14: batched append
    JdbcSink.append(facts, url, "orderbook_deltas",
      JdbcSink.deltaColumnTypes, props)

    val back = spark.read.jdbc(url, "orderbook_deltas", props)
    assert(back.count() === facts.count())
    assert(back.agg(sum("delta")).head.getLong(0) ===
      facts.agg(sum("delta")).head.getLong(0))
    // decimal price survives the round trip exactly
    val p = back.where(col("redis_stream_id") ===
        Fixtures.deltas.head.streamId)
      .select("price_dollars").head.getDecimal(0)
    assert(p === new java.math.BigDecimal(
      (Fixtures.deltas.head.priceCents / 100.0).toString).setScale(4))
  }
}
