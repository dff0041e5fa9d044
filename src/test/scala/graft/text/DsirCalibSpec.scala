package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** txt39/txt40 semantic pins beyond the hash gate: the DSIR draw must
  * actually TILT the pool toward the target domain (not just agree with
  * DuckDB about an arbitrary ranking), stay a true fixed-k
  * without-replacement sample, and be reproducible; the calibration
  * audit must partition the corpus exactly and keep every ppm field
  * inside its domain. */
class DsirCalibSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.01"

  test("txt39 tilts the sample toward the target domain and is a fixed-k draw") {
    val sel = TextAnalysis.dsirSelect(spark, dir).collect()
    assert(sel.length == TextAnalysis.DsirK)
    val ids = sel.map(_.getLong(0)).toSet
    assert(ids.size == sel.length, "sample drew a doc twice")
    // target share among selected must exceed the pool's en share — the
    // whole point of importance resampling. Pool is ~45% en at sf0.01;
    // the log-ratio weights should push the draw visibly above it.
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "lang").collect()
    val poolEn = docs.count(_.getString(1) == "en").toDouble / docs.length
    val en = docs.filter(r => ids.contains(r.getLong(0)))
      .count(_.getString(1) == "en").toDouble / sel.length
    assert(en > poolEn + 0.10,
      s"selected en share $en not tilted above pool share $poolEn")
    // deterministic: a second run draws the identical sample
    val again = TextAnalysis.dsirSelect(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(again == ids, "re-run drew a different sample")
  }

  test("txt40 bins partition the corpus and ppm fields stay in-domain") {
    val rows = TextAnalysis.calibrationAudit(spark, dir).collect()
    val n = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == n, "bins do not partition the corpus")
    val bins = rows.map(_.getLong(0)).toSeq
    assert(bins == bins.sorted && bins.toSet.subsetOf((0L to 9L).toSet))
    rows.foreach { r =>
      val (bin, conf, acc, gap) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      // mean confidence must live inside its own bin's probability range
      assert(conf >= bin * 100000L && conf <= math.min((bin + 1) * 100000L, 1000000L),
        s"bin $bin conf_ppm $conf outside bin range")
      assert(acc >= 0L && acc <= 1000000L)
      assert(gap == math.abs(conf - acc))
    }
    // the audit is non-trivial on this corpus: both tails populated
    assert(bins.head <= 2 && bins.last >= 7,
      s"fixture no longer exercises both confidence tails: $bins")
  }
}
