package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dd11 recall: every dirty name is a single interior deletion of a
  * catalog name, so when that SOURCE name survives in the canonical
  * half, a distance-1 match exists and the best match must sit at
  * distance ≤ 1 (the source itself, or something tied closer). Dirty
  * names whose source only occurs in the odd half may legitimately
  * match at 2 — they are excluded. A broken rare-gram stage would
  * surface here as far matches or misses for sourceable names. */
class FuzzyLinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("rare-gram blocking recovers a distance-<=1 match for every " +
    "dirty name whose source survives in the canonical half") {
    import spark.implicits._
    val part = graft.Tables.part(spark, dir)
      .select("p_partkey", "p_name").as[(Long, String)].collect()
    val canonNames = part.collect {
      case (k, n) if k % 2 == 0 => n
    }.toSet
    // replicate the operator's deterministic single-deletion minting
    val dirtyToSources = part.collect { case (k, n) if k % 2 == 1 =>
      val pos = (k / 2 % (n.length - 2)).toInt
      (n.substring(0, pos) + n.substring(pos + 1), n)
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val out = FuzzyLink.fuzzyLink(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val dname = r.getAs[String]("dname")
      val dist = r.getAs[Int]("dist")
      val sourceable = dirtyToSources(dname).exists(canonNames.contains)
      if (sourceable)
        assert(dist <= 1, s"'$dname' has a canonical source yet matched " +
          s"'${r.getAs[String]("cname")}' at distance $dist")
      assert(canonNames.contains(r.getAs[String]("cname")),
        s"match '${r.getAs[String]("cname")}' is not canonical")
    }
    // and no sourceable dirty name is silently dropped by the blocking
    val matchedNames = out.map(_.getAs[String]("dname")).toSet
    val missing = dirtyToSources.collect {
      case (dn, srcs) if srcs.exists(canonNames.contains) &&
        !matchedNames.contains(dn) => dn
    }
    assert(missing.isEmpty, s"sourceable names unmatched: ${missing.take(3)}")
  }
}
