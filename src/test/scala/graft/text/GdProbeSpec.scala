package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** txt34 (linear-probe GD training) semantic pins beyond the hash gate:
  * the loss trajectory is non-increasing (lr < 2/λmax — if a corpus or
  * lr change breaks the stability condition this goes red before the
  * oracle does), and the fitted slope lands near the corpus's actual
  * chars-per-token ratio — i.e. the training loop LEARNS, it doesn't
  * just agree with DuckDB about garbage. */
class GdProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("GD loss is non-increasing and the slope is learned") {
    val rows = TextAnalysis.linearProbeGd(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val loss = rows.sortBy(_.getInt(0)).map(_.getLong(3)).toSeq
    assert(loss == loss.sorted.reverse, s"loss not non-increasing: $loss")
    // y ≈ 1.8x on this corpus (tokens vs n_chars/10); 3 steps from zero
    // must land the scaled slope in a loose band around it
    val bFinal = rows.maxBy(_.getInt(0)).getLong(2)
    assert(bFinal > 1500000L && bFinal < 2200000L,
      s"slope b_s=$bFinal not in the learned band")
  }
}
