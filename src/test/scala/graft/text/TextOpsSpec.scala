package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural invariants of the packing/chunking operators — properties
  * the row-level oracle can't see (it checks values, not coverage). */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val sf = "/root/testdata/sf0.001"

  test("txt13: chunks tile every token exactly — full coverage, " +
    "stride-24 starts, 8-token overlap") {
    val chunks = TextAnalysis.chunkOverlap(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      // starts are exactly 0, 24, 48, ... and the last chunk ends at n
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Int]("chunk_idx") === i)
        assert(c.getAs[Int]("start_tok") === i * 24)
        assert(c.getAs[Int]("end_tok") ===
          math.min(n, i * 24 + 32), s"doc $id chunk $i")
        assert(c.getAs[Int]("n_tok") ===
          c.getAs[Int]("end_tok") - c.getAs[Int]("start_tok"))
      }
      assert(sorted.last.getAs[Int]("end_tok") === n,
        s"doc $id: tokens past the last chunk")
      // consecutive chunks overlap by 8 tokens (less only if the
      // previous chunk was already capped by the document end)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val overlap = a.getAs[Int]("end_tok") - b.getAs[Int]("start_tok")
          assert(overlap === 8 || a.getAs[Int]("end_tok") === n,
            s"doc $id overlap $overlap")
        case _ => ()
      }
    }
  }

  test("txt10: bins conserve the corpus token mass per language") {
    val bins = TextAnalysis.seqPack(spark, sf)
      .groupBy(col("lang"))
      .agg(sum(col("bin_tokens")).as("packed"),
        max(col("bin")).as("max_bin"), count(lit(1)).as("n_bins"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("packed"), r.getAs[Long]("max_bin"),
          r.getAs[Long]("n_bins"))).toMap
    val totals = graft.Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long"))
        .as("t"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("t"))
      .toMap
    totals.foreach { case (lang, t) =>
      val (packed, maxBin, nBins) = bins(lang)
      assert(packed === t, s"$lang: packed $packed != corpus $t")
      // bins are dense 0..max — a doc lands in the bin of its first
      // token, so every 2048-token stretch with a doc start is present
      assert(nBins === maxBin + 1, s"$lang: sparse bins")
    }
  }

  test("txt12: sample is the deterministic hash subset, rates honored") {
    val sampled = TextAnalysis.stratifiedSample(spark, sf)
    val n = sampled.count()
    // deterministic: same frame twice is identical
    assert(sampled.collect().map(_.getLong(0)).toSeq ===
      TextAnalysis.stratifiedSample(spark, sf).collect()
        .map(_.getLong(0)).toSeq)
    // every language retains at least one doc and no language exceeds
    // its per-mille ceiling grossly (binomial 5-sigma at sf0.001 sizes)
    val perLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = graft.Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    corpus.foreach { case (lang, total) =>
      val rate = lang match {
        case "en" => 0.5; case "zh" => 0.25; case _ => 0.8
      }
      val kept = perLang.getOrElse(lang, 0L).toDouble
      val sigma = math.sqrt(total * rate * (1 - rate))
      assert(math.abs(kept - total * rate) <= 5 * sigma + 1,
        s"$lang kept $kept of $total at target $rate")
    }
    assert(n > 0)
  }
}
