package graft

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable materialization for expensive SHARED SEAMS — plan subtrees
  * that feed several consumers (dd13's gram postings, mm05/mm06's
  * verified pHash pairs, the dd03/dd05/dd07 minhash signatures).
  *
  * A production pipeline checkpoints these to parquet: at 100 TB the
  * seam is hours of CPU and downstream jobs (dedup, clustering,
  * decontamination, audits) run at different times against the same
  * frozen corpus. Locally the same artifact keeps Verify and both
  * Bench passes from re-running the explode+distinct subtree that
  * dominates the seam queries' wall time — the round-8 verdict's
  * dd13/mm06 ask.
  *
  * Correctness: the artifact is the seam's EXACT output. Staleness is
  * impossible-by-key: the artifact name embeds a fingerprint of the
  * corpus directory's (name, size, mtime) listing, so a driver-side
  * testdata regeneration — even in place at the same path — yields a
  * different key and a fresh build (the memory-file lesson: testdata
  * dtypes/content DO drift between rounds). Completeness = Spark's own
  * `_SUCCESS` marker; a half-written artifact from a crashed writer
  * has no marker and is rebuilt whole. One concurrent writer per
  * corpus is the caller's job (same contract as
  * [[graft.streaming.QueueLog.append]]).
  *
  * With no cache dir configured (unit tests), the seam falls back to
  * `localCheckpoint` — the previous, session-scoped behavior.
  */
object Seams {

  /** Config key: directory for durable seam artifacts. Set by the
    * Verify/Bench mains; unset in unit tests. */
  val CacheDirKey = "spark.graft.seamCacheDir"

  /** Content fingerprint of a corpus dir: sha-256 over the sorted
    * (name, size, mtime) listing, 16 hex bytes. Catches in-place
    * regeneration, which a path digest alone would miss. */
  def corpusFingerprint(d: String): String = {
    val files = Option(new File(d).listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(files.mkString("\n").getBytes(UTF_8))
      .take(16).map("%02x".format(_)).mkString
  }

  /** Materialize `build` durably (parquet artifact keyed by seam name +
    * corpus fingerprint) when [[CacheDirKey]] is set, else
    * session-locally via localCheckpoint. */
  def durable(s: SparkSession, corpusDir: String, name: String)
      (build: => DataFrame): DataFrame =
    s.conf.get(CacheDirKey, null) match {
      case null => build.localCheckpoint()
      case dir => artifact(s, corpusDir, name, dir)(build)
    }

  /** Wall seconds spent BUILDING each seam in this process (reads cost
    * nothing here): the one-time price the warm bench numbers amortize.
    * Bench points the cache at a fresh dir so pass 1 pays every build
    * exactly once, then emits this map as `seam_build` next to
    * `seam_cache:true` — the round-9 verdict's cold-start disclosure. */
  private val built =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  def buildTimes: Map[String, Double] = built.toMap

  /** The artifact path itself, for callers with their own config key
    * (the minhash sig seam predates [[CacheDirKey]] and keeps
    * `spark.graft.sigCacheDir`). */
  def artifact(s: SparkSession, corpusDir: String, name: String,
      cacheDir: String)(build: => DataFrame): DataFrame = {
    val art = new File(cacheDir,
      s"$name-${corpusFingerprint(corpusDir)}").toString
    if (!new File(art, "_SUCCESS").isFile) {
      val t0 = System.nanoTime()
      build.write.mode("overwrite").parquet(art)
      val sec = (System.nanoTime() - t0) / 1e9
      built.updateWith(name) {
        case Some(v) => Some(v + sec)
        case None => Some(sec)
      }
    }
    s.read.parquet(art)
  }
}
