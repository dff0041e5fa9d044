package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary. The testdata parquet is DRIVER-owned and has
  * changed once already (round 6→7: `events.ts` went from INT64 nanos to
  * timestamp[us], silently killing 41 queries at analysis time). This
  * spec opens every sf0.001 table and asserts the dtypes the loaders
  * assume, naming the loader to fix on mismatch — so the next drift is
  * one pointed red test, not a wave of silent disappearances.
  */
class SchemaCanarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  private def dtype(table: String, col: String): DataType =
    Tables.load(spark, dir, table).schema(col).dataType

  private val timestampish: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  test("events.ts is a type Tables.events handles (INT64 nanos or timestamp)") {
    val t = dtype("events", "ts")
    assert(timestampish.contains(t),
      s"events.ts drifted to $t — update the dtype branch in Tables.events " +
        "(Tables.scala) and its oracle epoch_ms parity")
  }

  test("events core columns") {
    assert(dtype("events", "event_id") == LongType)
    assert(dtype("events", "user_id") == LongType)
    assert(dtype("events", "event_type") == StringType)
    assert(dtype("events", "value") == DoubleType)
    assert(dtype("events", "props") == StringType,
      "events.props must be a JSON string — orderbook/Normalize.scala parses it")
  }

  test("date columns the relational queries truncate/compare") {
    assert(timestampish.contains(dtype("lineitem", "l_shipdate")),
      "l_shipdate drifted — check relational/Relational.scala date handling")
    assert(timestampish.contains(dtype("orders", "o_orderdate")),
      "o_orderdate drifted — check relational/Relational.scala date handling")
  }

  test("embeddings.embedding is array<float>") {
    assert(dtype("embeddings", "embedding") == ArrayType(FloatType, true) ||
      dtype("embeddings", "embedding") == ArrayType(FloatType, false),
      "embedding drifted — check similarity/Similarity.scala vector math")
  }

  test("documents text/meta columns") {
    assert(dtype("documents", "doc_id") == LongType)
    assert(dtype("documents", "text") == StringType)
    assert(dtype("documents", "lang") == StringType)
  }

  test("join-key dtypes are stable (int32 vs int64 matters for joins)") {
    assert(dtype("customer", "c_custkey") == LongType)
    assert(dtype("customer", "c_nationkey") == IntegerType)
    assert(dtype("nation", "n_nationkey") == IntegerType)
    assert(dtype("nation", "n_regionkey") == IntegerType)
    assert(dtype("region", "r_regionkey") == IntegerType)
    assert(dtype("orders", "o_custkey") == LongType)
    assert(dtype("lineitem", "l_orderkey") == LongType)
    assert(dtype("lineitem", "l_partkey") == LongType)
    assert(dtype("lineitem", "l_suppkey") == LongType)
    assert(dtype("supplier", "s_suppkey") == LongType)
    assert(dtype("part", "p_partkey") == LongType)
  }

  // ---- content contracts (round-8 advice item 6) -------------------
  // Dtype canaries catch TYPE drift; the oracles also assume CONTENT
  // shapes the driver's generator could change silently. Each test
  // names the queries that break on drift. These run on the LIVE
  // parquet, so a regenerated testdata set re-adjudicates them.

  test("props.k is an unquoted integer or absent (q42/q55 contract)") {
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, dir, "events")
    // a QUOTED number ({"k":"5"}) diverges the engines: Spark's typed
    // from_json nulls the record, DuckDB's text extract still casts
    assert(e.where(col("props").rlike("\"k\"\\s*:\\s*\"")).limit(1)
      .count() == 0L,
      "events.props now quotes k — q42/q55 Spark-vs-DuckDB semantics diverge")
    // and the key must actually occur, or both queries silently test
    // nothing but COUNT(*)
    assert(e.where(col("props").rlike("\"k\"\\s*:")).limit(1).count() == 1L,
      "events.props no longer carries k — q42/q55 aggregates are vacuous")
  }

  test("documents.text is single-space tokenized (txt* split contract)") {
    import org.apache.spark.sql.functions._
    val d = Tables.load(spark, dir, "documents")
    // every txt query splits on ' ' in Spark and string_split(text,' ')
    // in DuckDB; tabs, newlines, doubled/leading/trailing spaces or
    // empty docs would make the two tokenizations diverge
    val bad = d.where(
      col("text").contains("\t") || col("text").contains("\n") ||
        col("text").contains("  ") || col("text").startsWith(" ") ||
        col("text").endsWith(" ") || col("text") === "")
    assert(bad.limit(1).count() == 0L,
      "documents.text whitespace drifted — txt token counts will diverge " +
        "between split(text,' ') and DuckDB string_split")
  }

  test("embeddings are fixed-dimension (sim* dot-product contract)") {
    import org.apache.spark.sql.functions._
    val dims = Tables.load(spark, dir, "embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(64),
      s"embedding dims drifted to ${dims.mkString(",")} — sim* zip_with " +
        "dot products assume uniform 64-dim vectors")
  }

  test("all ten tables are present and non-empty at sf0.001") {
    Tables.names.foreach { t =>
      assert(Tables.load(spark, dir, t).limit(1).count() == 1L,
        s"table $t is missing or empty at sf0.001")
    }
  }
}
