package graft.dedup

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dd13's scale claim under the load it was designed for: a corpus
  * where EVERY document shares the same boilerplate head. Without the
  * document-frequency cap the inverted index joins all n docs on each
  * boilerplate gram — O(n²) pairs from tokens that carry zero signal;
  * with the cap those grams leave the index (and the denominator), so
  * boilerplate alone must never link two documents.
  */
class ContainmentSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private val nDocs = 300 // df(boilerplate grams) = 300 >> the df cap

  private lazy val dir: String = {
    val p = Files.createTempDirectory("graft-skew")
    p.toFile.deleteOnExit()
    import spark.implicits._
    // 6 shared boilerplate tokens + 12 doc-unique tokens: every doc
    // pair shares exactly the boilerplate 3-grams and nothing else
    (0 until nDocs).map { i =>
      val unique = (0 until 12).map(j => s"u${i}w$j").mkString(" ")
      (i.toLong, s"common legal boilerplate header line text $unique",
        "en")
    }.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$p/documents.parquet")
    p.toString
  }

  test("boilerplate shared by every document never links a pair — the " +
    "df cap drops hot grams from index AND denominator") {
    val out = Dedup.containmentPairs(spark, dir).collect()
    // base-base pairs share ONLY capped grams: none may survive
    val baseBase = out.filter(r => r.getLong(0) < 3000000L)
    assert(baseBase.isEmpty,
      s"boilerplate-only pairs leaked: ${baseBase.take(5).mkString(", ")}")
    // the operator's own injected excerpts are the only legitimate
    // containments; whatever subset passes the size gate must point at
    // its own source with full rare-gram containment
    out.foreach { r =>
      assert(r.getLong(0) === r.getLong(1) + 3000000L,
        s"unexpected pair: $r")
      assert(r.getDouble(5) === 1.0, s"partial containment: $r")
    }
  }
}
