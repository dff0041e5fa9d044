package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dd19/dd20 contract on a corpus BUILT to trip the cap: a synthetic
  * boilerplate mega-cluster (identical text ⇒ identical signatures ⇒
  * one band bucket per band holding the whole cluster). Pins the three
  * claims the registry gate can't isolate at small SF:
  *  - the capped route emits O(m) star candidates where the all-pairs
  *    route emits O(m²);
  *  - final CLUSTERS are identical on a true duplicate set (star
  *    preserves connectivity; exact verification passes either way);
  *  - dd20's audit arithmetic (pairs_avoided, star_edges) matches the
  *    bucket census exactly. */
class BucketCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private val Cap = 8
  private val NDocs = 240L
  private val Boiler = 80L // doc_id < 80 share one identical text

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-capspec")
    val boiler = "the same template text repeated for every " +
      "boilerplate document in this synthetic corpus end"
    spark.range(NDocs).select(
        col("id").as("doc_id"),
        when(col("id") < Boiler, lit(boiler))
          .otherwise(concat_ws(" ", transform(
            sequence(lit(1), lit(25)),
            i => concat(lit("u"), pmod(hash(col("id"), i), lit(100000))))))
          .as("text"),
        lit("en").as("lang"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d.toString
  }

  private def clustersOf(cand: DataFrame): Set[String] = {
    val sig = Dedup.minhashSig(spark, dir)
    Dedup.connectedComponentsStar(
        Dedup.attachVerify(sig, cand)
          .select(col("id_a").as("src"), col("id_b").as("dst")))
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("id")).as("max_id"))
      .collect().map(_.toString).toSet
  }

  test("capped candidates are O(m) where all-pairs is O(m^2), and the " +
    "final clusters are identical on a true duplicate set") {
    val sig = Dedup.minhashSig(spark, dir)
    val naive = Dedup.bandedCandidatesOn(sig).count()
    val capped = Dedup.cappedCandidatesOn(sig, Cap).count()
    // docsAug injects %7/%11 copies, so the boilerplate cluster is a
    // bit larger than Boiler; the clique is still ~m^2/2 while the
    // star route is m-1
    // docs 0..79 with %7==0 -> 12 ids, %11==0 -> 8 ids
    val m = Boiler + 12 + 8
    assert(naive >= m * (m - 1) / 2,
      s"expected a clique-sized candidate set, got $naive")
    // linear bound: ≤ w edges per member per sort pass (2 passes,
    // mostly deduped on an all-identical bucket) + the small-bucket
    // pairs — far under the m²/2 ≈ 5000 clique either way
    assert(capped < 2 * (Dedup.LshChainWindow + 1) * m,
      s"capped candidates not linear: $capped")
    assert(clustersOf(Dedup.cappedCandidatesOn(sig, Cap)) ===
      clustersOf(Dedup.bandedCandidatesOn(sig)))
  }

  test("the chain-window recall knob: per-w edge sets grow " +
    "monotonically, stay subsets of all-pairs, and stay O(w*c)") {
    val sig = Dedup.minhashSig(spark, dir)
    def edges(w: Int): Set[(Long, Long)] =
      Dedup.cappedCandidatesOn(sig, Cap, w).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byW = (1 to 3).map(edges)
    val all = Dedup.bandedCandidatesOn(sig).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // linking i..i-w contains every i..i-(w-1) link, and every chain
    // link joins two members of one bucket under the same prefilter —
    // so the sets nest, and capping still can only SPLIT components
    byW.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), "chain edges not monotone in w") }
    assert(byW.last.subsetOf(all),
      "chain edges escaped the all-pairs candidate set")
    // cost bound: each +1 of w adds at most one edge per quarantined
    // row PER BAND (4 here) PER SORT PASS (2) — linear in bucket
    // population, never the m^2/2 clique
    val m = Boiler + 12 + 8
    byW.sliding(2).foreach { case Seq(a, b) =>
      assert(b.size - a.size <= 8 * m, "per-w edge growth not O(w*c)") }
  }

  test("dd20 audit arithmetic matches the bucket census") {
    val sig = Dedup.minhashSig(spark, dir)
    val bands = sig.select(col("doc_id"), explode(expr(
      """transform(sequence(0, 3), b -> struct(b as band,
        |  aggregate(slice(sig, 8 * b + 1, 8), 0L,
        |    (acc, h) -> (acc * 31 + h) % 1000000007) as bkey))""".stripMargin))
      .as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bkey").as("bkey"))
    val census = bands.groupBy(col("band"), col("bkey")).count()
      .where(col("count") > Dedup.LshBucketCap)
      .groupBy(col("band"))
      .agg(sum(expr("count * (count - 1) div 2")).as("avoided"),
        sum((col("count") * Dedup.LshChainWindow -
          Dedup.LshChainWindow * (Dedup.LshChainWindow + 1) / 2) * 2)
          .as("stars"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    val audit = Dedup.lshBucketAudit(spark, dir)
      .collect().map(r => (r.getLong(0).toInt,
        (r.getLong(5), r.getLong(6)))).toMap
    // the 100-doc boilerplate cluster exceeds the production cap (64),
    // so the quarantine really trips here — the census must be
    // non-empty and the audit's avoided/star arithmetic exact
    assert(census.nonEmpty, "corpus failed to trip the production cap")
    census.foreach { case (b, v) => assert(audit(b) === v) }
    audit.foreach { case (b, v) =>
      assert(v === census.getOrElse(b, (0L, 0L))) }
  }
}
