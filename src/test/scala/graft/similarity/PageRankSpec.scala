package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** sim25 invariants the hash gate can't express: ranks are positive,
  * bounded by the total mass scale, and the top node genuinely
  * out-ranks the uniform start (centrality was propagated, not just
  * initialized). */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("pagerank ranks are positive, mass-bounded, and non-uniform") {
    val rows = Similarity.pageRank(spark, dir).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.forall(_ > 0L))
    // no single node can exceed the total mass scale
    assert(ranks.forall(_ <= 1000000000000L))
    // rnk is 1..20 aligned with descending rank_s
    assert(rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq ==
      ranks.sortBy(-_).toSeq)
    // the surfer concentrated mass: top node beats the uniform start
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(ranks.max > 1000000000000L / n,
      s"top rank ${ranks.max} did not exceed uniform ${1000000000000L / n}")
  }
}
