package graft.multimodal

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The durable pHash seams (mm05's verified pair set, mm06's cluster
  * assignment) — SigCacheSpec's contract mirrored onto the mm family
  * (round-9 verdict item 10): the seam REBUILD path (no cache dir →
  * localCheckpoint) and the durable path must produce the same rows;
  * the durable artifact is written once and a fresh session reuses it
  * byte-for-byte untouched, with results identical cold and warm. */
class MmSeamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  private def ls(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try {
      val it = s.iterator()
      val out = Seq.newBuilder[Path]
      while (it.hasNext) out += it.next()
      out.result()
    } finally s.close()
  }

  private def artifactFiles(cache: Path, prefix: String)
      : Map[String, Long] = {
    val art = ls(cache).find(_.getFileName.toString.startsWith(prefix))
    assert(art.isDefined, s"no $prefix artifact written")
    ls(art.get).map(f =>
      f.getFileName.toString -> Files.getLastModifiedTime(f).toMillis).toMap
  }

  test("mm05/mm06 seams: cold rebuild == durable build; the artifact " +
    "is written once and reused untouched by a fresh session") {
    // baseline: the session-scoped (non-durable, localCheckpoint) path
    val wantPairs = Multimodal.phashNearDup(spark, dir).collect().toSeq
    val wantClusters = Multimodal.phashClusters(spark, dir).collect().toSeq

    val cache = Files.createTempDirectory("graft-mmseam")
    cache.toFile.deleteOnExit()

    // "session 1": durable path populates both artifacts (cold build)
    val s1 = spark.newSession()
    s1.conf.set(graft.Seams.CacheDirKey, cache.toString)
    assert(Multimodal.phashNearDup(s1, dir).collect().toSeq === wantPairs,
      "cold durable mm05 differs from the rebuild path")
    assert(Multimodal.phashClusters(s1, dir).collect().toSeq ===
      wantClusters, "cold durable mm06 differs from the rebuild path")
    val pairs1 = artifactFiles(cache, "mm05-dct-pairs-")
    val cc1 = artifactFiles(cache, "mm06-dct-cc-")
    assert(pairs1.contains("_SUCCESS"), s"incomplete pair artifact: $pairs1")
    assert(cc1.contains("_SUCCESS"), s"incomplete cc artifact: $cc1")

    // "session 2": warm — must REUSE both artifacts byte-for-byte
    val s2 = spark.newSession()
    s2.conf.set(graft.Seams.CacheDirKey, cache.toString)
    assert(Multimodal.phashNearDup(s2, dir).collect().toSeq === wantPairs)
    assert(Multimodal.phashClusters(s2, dir).collect().toSeq ===
      wantClusters)
    assert(artifactFiles(cache, "mm05-dct-pairs-") === pairs1,
      "warm session rewrote the mm05 pair artifact instead of reusing it")
    assert(artifactFiles(cache, "mm06-dct-cc-") === cc1,
      "warm session rewrote the mm06 cc artifact instead of reusing it")
  }

  test("the seam build is TIMED exactly when it builds: fresh cache " +
    "dir records a build, warm reuse does not add to it") {
    val cache = Files.createTempDirectory("graft-mmseam-t")
    cache.toFile.deleteOnExit()
    val s1 = spark.newSession()
    s1.conf.set(graft.Seams.CacheDirKey, cache.toString)
    val before = graft.Seams.buildTimes.getOrElse("mm05-dct-pairs", 0.0)
    Multimodal.phashNearDup(s1, dir).collect()
    val afterCold = graft.Seams.buildTimes("mm05-dct-pairs")
    assert(afterCold > before, "cold build not recorded in buildTimes")
    Multimodal.phashNearDup(s1, dir).collect()
    assert(graft.Seams.buildTimes("mm05-dct-pairs") === afterCold,
      "warm reuse was mis-recorded as a build")
  }
}
