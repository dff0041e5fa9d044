package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.orderbook.{Fixtures, Normalize, Schemas}

/** Source/sink format coverage: the normalized fact table round-trips
  * through every columnar/text format the engine exposes, preserving
  * row counts, aggregates, and (where the format can) types. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private def facts = Normalize.flattenDeltas(
    Normalize.parseDeltaEntries(Fixtures.deltaEntries(spark)))

  test("parquet and orc round-trip with exact schema") {
    Seq("parquet", "orc").foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft-$fmt").toString
      facts.write.mode("overwrite").format(fmt).save(dir)
      val back = spark.read.format(fmt).load(dir)
      assert(back.schema === facts.schema, fmt)
      assert(back.count() === facts.count(), fmt)
      assert(back.agg(sum("delta")).head.getLong(0) ===
        facts.agg(sum("delta")).head.getLong(0), fmt)
    }
  }

  test("csv round-trips values through an explicit read schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    facts.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(Schemas.deltasTable).csv(dir)
    assert(back.count() === facts.count())
    assert(back.agg(sum("delta")).head.getLong(0) ===
      facts.agg(sum("delta")).head.getLong(0))
    assert(back.schema("price_dollars").dataType === Schemas.price)
  }

  test("json lines round-trip against the declared schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    facts.write.mode("overwrite").json(dir)
    val back = spark.read.schema(Schemas.deltasTable).json(dir)
    assert(back.count() === facts.count())
    assert(back.exceptAll(facts).count() === 0)
  }
}
