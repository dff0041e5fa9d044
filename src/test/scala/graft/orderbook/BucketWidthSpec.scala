package graft.orderbook

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two-level scan's bucket width is a PHYSICAL knob
  * (`spark.graft.scanBucketRows`): any width must produce the identical
  * row set, because Bench tunes it from data density while the
  * correctness gate runs the 256-row default — the two must provably
  * agree. Widths straddle the interesting regimes: 64 forces many
  * buckets per key (carry handoff everywhere), 100000 collapses most
  * keys to a single bucket (carry mostly absent). */
class BucketWidthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  private def rowsAtWidth(q: String, target: String): Seq[String] = {
    val prev = spark.conf.getOption("spark.graft.scanBucketRows")
    spark.conf.set("spark.graft.scanBucketRows", target)
    try graft.SparkEntry.queries(q)(spark, dir)
      .collect().map(_.toString).toSeq
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.scanBucketRows", v)
      case None => spark.conf.unset("spark.graft.scanBucketRows")
    }
  }

  Seq("ob09_seq_gaps", "ob14_asof_price", "ob18_realized_var").foreach { q =>
    test(s"$q returns the same rows at widths 64 / 256 / 100000") {
      val base = rowsAtWidth(q, "256")
      assert(base.nonEmpty, s"$q empty at sf0.001 — width test is vacuous")
      assert(rowsAtWidth(q, "64") === base, s"$q differs at width 64")
      assert(rowsAtWidth(q, "100000") === base, s"$q differs at width 100000")
    }
  }
}
