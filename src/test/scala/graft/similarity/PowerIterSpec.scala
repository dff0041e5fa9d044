package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** sim26 invariants beyond the hash gate: the λ estimate is positive,
  * can never exceed the trace (aniso ≤ 1 — λmax of a PSD matrix is
  * bounded by its trace), and grows from the arbitrary e₁ start
  * (power iteration is converging, not stuck). */
class PowerIterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("power iteration: 0 < lambda, aniso <= 1, estimate improves") {
    val rows = Similarity.powerIteration(spark, dir).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      assert(r.getDouble(1) > 0, "lambda must be positive")
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0,
        s"aniso ${r.getDouble(2)} outside (0, 1]")
    }
    assert(rows.last.getDouble(1) >= rows.head.getDouble(1),
      "lambda estimate did not improve from the e1 start")
  }
}
