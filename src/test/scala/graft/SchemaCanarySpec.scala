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

  test("all ten tables are present and non-empty at sf0.001") {
    Tables.names.foreach { t =>
      assert(Tables.load(spark, dir, t).limit(1).count() == 1L,
        s"table $t is missing or empty at sf0.001")
    }
  }
}
