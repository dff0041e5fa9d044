package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** txt41/txt42 semantic pins beyond the hash gate: the MW loop must
  * actually REWEIGHT (monotonically toward the most-mispriced domain,
  * away from the best-fit one, mass conserved up to floor loss), and
  * the PMI table must be a valid association ranking (thresholded,
  * deduplicated, ordered). */
class MixturePmiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.01"

  test("txt41 MW tilts toward the max-excess domain and conserves mass") {
    val rows = TextAnalysis.doremiMw(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5 * TextAnalysis.MwIters)
    val byIter = rows.groupBy(_._1)
    byIter.foreach { case (it, rs) =>
      val mass = rs.map(_._4).sum
      assert(mass > 1000000L - rs.length && mass <= 1000000L,
        s"iter $it mass $mass outside floor-loss band")
    }
    val hi = rows.maxBy(_._3)._2 // most-mispriced domain
    val lo = rows.minBy(_._3)._2 // best-fit domain
    val hiW = (1 to TextAnalysis.MwIters)
      .map(it => rows.find(r => r._1 == it && r._2 == hi).get._4)
    val loW = (1 to TextAnalysis.MwIters)
      .map(it => rows.find(r => r._1 == it && r._2 == lo).get._4)
    assert(hiW == hiW.sorted && hiW.distinct.size == hiW.size,
      s"max-excess domain $hi not strictly upweighted: $hiW")
    assert(loW == loW.sorted.reverse && loW.distinct.size == loW.size,
      s"min-excess domain $lo not strictly downweighted: $loW")
  }

  test("txt42 PMI table is thresholded, deduplicated, and rank-ordered") {
    val rows = TextAnalysis.pmiCollocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20)
    assert(rows.forall(_._3 >= TextAnalysis.PmiMinCount))
    val pairs = rows.map(r => (r._1, r._2))
    assert(pairs.distinct.length == pairs.length)
    val pmis = rows.map(_._4).toSeq
    assert(pmis == pmis.sorted.reverse, s"pmi not non-increasing: $pmis")
    // FIXTURE pin (not an invariant — a corpus where they coincide is
    // valid): on this corpus the association ranking must disagree with
    // the raw-frequency ranking — the top-PMI pair is not the globally
    // most frequent bigram, computed independently below
    val topFreq = graft.Tables.documents(spark, dir)
      .selectExpr("filter(split(text, ' '), w -> length(w) > 0) as ws")
      .selectExpr("posexplode(ws) as (pos, w)", "ws")
      .selectExpr("w as w1", "try_element_at(ws, pos + 2) as w2")
      .where(org.apache.spark.sql.functions.col("w2").isNotNull)
      .groupBy("w1", "w2").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc,
        org.apache.spark.sql.functions.col("w1"),
        org.apache.spark.sql.functions.col("w2"))
      .limit(1).collect().head
    assert((rows.head._1, rows.head._2) !=
      (topFreq.getString(0), topFreq.getString(1)),
      "fixture no longer separates PMI ranking from frequency ranking")
  }
}
