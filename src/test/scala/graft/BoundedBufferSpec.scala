package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the session-global ObjectHashAggregate fallback threshold.
  *
  * GraftSession raises spark.sql.objectHashAggregate.sortBased
  * .fallbackThreshold to 4M because every graft TypedImperativeAggregate
  * (graft_topk, Misra–Gries, KMV, bloom) is bounded-state by design —
  * the sort-based fallback was catastrophic for them (round-14: a
  * 10⁹-row sort, ~80 GB spill, at the 1M-vector kNN point). But the
  * config is SESSION-GLOBAL: it also disarms the OOM guard for
  * UNBOUNDED-buffer aggregates (collect_list / collect_set), whose
  * per-key state grows with group cardinality. The engine invariant is
  * therefore: every collect_list/collect_set site in main code must
  * have a per-group size bound that does not grow with the corpus
  * (fixed subspace/dimension fan-in, per-message ladder levels,
  * per-document tokens — row-size-bounded, never corpus-bounded).
  *
  * This spec makes that invariant a conscious review: it enumerates the
  * call sites and pins them to a reviewed allowlist of per-file counts.
  * Adding a new collect_list/collect_set fails here until the site is
  * reviewed for boundedness and the allowlist is updated (with the
  * bound stated in a comment at the site).
  */
class BoundedBufferSpec extends AnyFunSuite {

  private val SitePattern = "collect_(list|set)\\s*\\(".r

  /** Reviewed sites: file → expected call-site count. Every entry's
    * boundedness argument (per-group buffer ≤ a corpus-independent
    * constant or ≤ one input row's own size):
    *  - StreamedQueries: ladder collect_list groups by message — ≤ the
    *    per-message level count (row-size-bounded).
    *  - Similarity: PQ code/LUT assembly groups carry ≤ subspaces(4) or
    *    ≤ codewords(8) items; Lloyd/centroid updates ≤ dims(64); PQ
    *    codebook training updates ≤ dims-per-subspace(16); trained
    *    coarse-centroid updates ≤ dims(64);
    *    token-weight assembly ≤ subvector count (4); sim33's residual
    *    code/LUT assembly duplicates sim21's three sites with the
    *    same ≤ subspaces(4) / ≤ codewords(8) bounds; sim35's new
    *    centroid assembly ≤ dims(64) per retrained cell.
    *  - Advanced: per-document token→count map — bounded by one
    *    document's own token count (row-size-bounded).
    * (TextAnalysis dropped off this list in r18: txt27's merge-list
    * assembly became a driver-trained LITERAL array — no in-plan
    * collect_list at all.)
    */
  private val allow: Map[String, Int] = Map(
    "streaming/StreamedQueries.scala" -> 1,
    "similarity/Similarity.scala" -> 14,
    "relational/Advanced.scala" -> 1)

  test("every collect_list/collect_set site in main is reviewed-bounded") {
    val root = new java.io.File("src/main/scala/graft")
    assert(root.isDirectory, s"run from the repo root (cwd=${
      new java.io.File(".").getCanonicalPath})")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val found = walk(root).flatMap { f =>
      val rel = f.getPath.stripPrefix("src/main/scala/graft/")
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
      val hits = lines.zipWithIndex.collect {
        // comments mentioning the function are not call sites
        case (l, i) if SitePattern.findFirstIn(l).isDefined &&
          !l.trim.startsWith("//") && !l.trim.startsWith("*") => (rel, i + 1)
      }
      hits
    }
    val counts = found.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts == allow,
      s"""collect_list/collect_set call sites changed.
         |found:  $counts
         |allowed: $allow
         |sites: ${found.mkString(", ")}
         |A new unbounded-buffer aggregate under the 4M
         |objectHashAggregate fallback threshold (GraftSession) is an
         |OOM risk at scale — review the new site's per-group bound,
         |document it at the site, and update this allowlist.""".stripMargin)
  }
}
