package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Property check for the two-level skyline algebra: on ANY small
  * (doc_id, score, length) frame — duplicates, ties, negative scores,
  * single-bucket and bucket-straddling score ranges — `frontierOf`
  * must return exactly the weakly-non-dominated rows. The generator
  * deliberately spans several [[Skyline.ScoreBucketWidth]] buckets AND
  * collapses many rows onto few scores, the two regimes where the
  * within-bucket/cross-bucket split and the per-score max collapse can
  * disagree with textbook dominance if either is wrong. Case count is
  * modest: each case is a full (tiny) Spark job. */
object SkylineProps extends Properties("skyline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.init()

  private val frameGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      s <- Gen.chooseNum(-200L, 200L) // spans ~7 width-64 buckets
      c <- Gen.chooseNum(0L, 40L)     // small domain forces ties
    } yield (s, c))
  } yield rows

  property("frontierOf equals brute-force weak dominance") =
    Prop.forAll(frameGen) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((s, c), i) => (i.toLong, s, c) }
        .toDF("doc_id", "sscore", "n_chars")
      val got = Skyline.frontierOf(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val all = rows.zipWithIndex
        .map { case ((s, c), i) => (i.toLong, s, c) }
      val want = all.filter { case (_, s, c) =>
        !all.exists { case (_, s2, c2) =>
          s2 >= s && c2 >= c && (s2 > s || c2 > c) }
      }.toSet
      got == want
    }
}
