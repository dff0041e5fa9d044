package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Salting must redistribute hot keys without changing any result. */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val sf = "/root/testdata/sf0.001"

  test("salted aggregation equals the direct aggregation") {
    val docs = Tables.documents(spark, sf)
    val salted = Salting.saltedAgg(docs, col("lang"), col("doc_id"), 8,
        Seq(count(lit(1)).as("n"), sum(length(col("text"))).as("chars")),
        Seq(sum("n").as("n"), sum("chars").as("chars")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("salted join equals the plain join and widens the key space") {
    val docs = Tables.documents(spark, sf)
    val dim = docs.groupBy(col("lang")).agg(count(lit(1)).as("lang_total"))
    val salted = Salting.saltedJoin(docs, dim, "lang", col("doc_id"), 8)
    val plain = docs.join(dim, "lang")
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("lang_total")).head.getLong(0) ===
      plain.agg(sum("lang_total")).head.getLong(0))
    // the shuffle key is (lang, __salt), not lang alone
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p)
  }

  test("date-partitioned parquet scan prunes to the filtered partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
    Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite")
      .parquet(dir.toString)
    val read = spark.read.parquet(dir.toString)
      .where(col("event_date") === "2024-01-05")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_date"),
      s"no partition filter:\n$p")
    // the pruned scan touches exactly the one partition's rows
    val expected = Tables.events(spark, sf)
      .where(to_date(col("ts")) === "2024-01-05").count()
    assert(read.count() === expected && expected > 0)
  }
}
