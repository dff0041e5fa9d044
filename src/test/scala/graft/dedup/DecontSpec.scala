package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dd10: the Bloom prefilter is routing only — the report must be
  * byte-for-byte the dd08 report (the exact verify join removes every
  * false positive the sketch lets through, and the sketch has no false
  * negatives by construction). */
class DecontSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("bloom-routed decontamination equals the broadcast-exact report") {
    val ord = org.apache.spark.sql.functions.col("doc_id")
    assert(
      Dedup.decontaminateBloom(spark, dir).orderBy(ord).collect().toSeq ===
        Dedup.decontaminate(spark, dir).orderBy(ord).collect().toSeq)
  }
}
