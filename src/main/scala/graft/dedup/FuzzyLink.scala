package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Tables

/** Record linkage / fuzzy entity matching — the data-integration twin
  * of near-dup detection: match DIRTY surface forms (vendor feeds, OCR,
  * user input) against a CANONICAL dictionary under an edit-distance
  * tolerance, without the |dirty|×|canon| cross join.
  *
  * Shape (each stage bounded):
  *   1. DICTIONARY EXTRACTION — matching runs on distinct names, never
  *      rows: vocabulary ≪ fact cardinality, and fact rows rejoin the
  *      verdict through a broadcast at the end (the same
  *      dictionary-then-broadcast-back pattern as txt09/txt12's hash
  *      gates). At 100 TB the fact table contributes one distinct +
  *      one broadcast join; everything pairwise happens at
  *      vocabulary scale.
  *   2. RARE-GRAM BLOCKING — candidate pairs must share one of the
  *      name's 3 RAREST bigrams (frequency from the canonical
  *      dictionary, ties broken on the gram). Rarest-k selection kills
  *      hot blocking keys by construction — a gram shared by half the
  *      vocabulary is never anyone's rarest — so no fixed hot key
  *      concentrates candidates (the failure mode banded-minhash
  *      solves for documents; names are too short for 32-perm minhash
  *      to discriminate, rare-gram selection is the short-string
  *      equivalent).
  *   3. BOUNDED VERIFY — exact `levenshtein` only on blocked pairs,
  *      threshold ≤ 2, best match per dirty name by (distance,
  *      canon_id) — total order, bit-stable, same spelling in the
  *      oracle.
  *
  * The dirty feed is minted deterministically from the odd half of the
  * part catalog (one interior character deleted, position keyed by the
  * row id — edit distance exactly 1 from its source name), the
  * canonical dictionary from the even half — same injected-truth
  * technique as dd08's leaked eval docs. */
object FuzzyLink {

  /** One char deleted at a row-keyed position in [1, len-2] (1-based:
    * possibly the first char, never the last — the name always keeps
    * its tail and stays non-degenerate). Callers must filter
    * length ≥ 3 first: the position modulus is length-2, and ANSI mode
    * makes `% 0` a fatal error, not a null. */
  private def perturbed(name: String, key: String) =
    expr(s"""concat(
      |  substring($name, 1, cast($key div 2 % (length($name) - 2) as int) ),
      |  substring($name, cast($key div 2 % (length($name) - 2) as int) + 2,
      |            length($name)))""".stripMargin)

  /** Distinct character bigrams; empty for names too short to have one
    * (sequence(1, len-1) would DESCEND for len < 2, not stay empty). */
  private def bigrams(name: String) = expr(
    s"case when length($name) < 2 then array() " +
      s"else array_distinct(transform(sequence(1, length($name) - 1), " +
      s"i -> substring($name, i, 2))) end")

  def fuzzyLink(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    // canonical dictionary: distinct names of the even half, keyed by
    // their smallest part id (deterministic representative)
    val canon = part.where(col("p_partkey") % 2 === 0)
      .groupBy(col("p_name").as("cname"))
      .agg(min(col("p_partkey")).as("canon_id"))
    // dirty dictionary: distinct perturbed names of the odd half, with
    // the fact-row count each name stands for (the broadcast-back).
    // length ≥ 3: shorter names have no interior char to delete (and
    // the position modulus would be an ANSI 0-division)
    val dirty = part.where(col("p_partkey") % 2 === 1 &&
        length(col("p_name")) >= 3)
      .select(col("p_partkey"),
        perturbed("p_name", "p_partkey").as("dname"))
      .groupBy(col("dname"))
      .agg(min(col("p_partkey")).as("dirty_id"),
        count(lit(1)).as("n_rows"))
    // bigram frequencies over the CANONICAL dictionary only — the probe
    // side ranks by the same table, so both engines select identical
    // rare grams; grams absent from canon have no join partner anyway
    val cgrams = canon.select(col("cname"), col("canon_id"),
      explode(bigrams("cname")).as("gram"))
    val freq = cgrams.groupBy(col("gram")).agg(count(lit(1)).as("f"))
    def rare3(grams: DataFrame, id: String): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(col("f"), col("gram"))
      grams.join(freq, "gram")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
    }
    val canonRare = rare3(cgrams, "cname")
      .select(col("gram"), col("cname"), col("canon_id"))
    val dirtyRare = rare3(
      dirty.select(col("dname"), col("dirty_id"),
        explode(bigrams("dname")).as("gram")), "dname")
      .select(col("gram"), col("dname"))
    // block on shared rare grams, verify with exact edit distance,
    // best match per dirty name by (distance, canon_id)
    val wBest = Window.partitionBy(col("dname"))
      .orderBy(col("dist"), col("canon_id"))
    val matched = dirtyRare.join(canonRare, "gram")
      // levenshtein ≥ |length gap|: pairs more than the tolerance apart
      // in length alone can never verify — prune INSIDE the blocking
      // join, before the distinct shuffle and the edit-distance pass
      // (mirrored in the oracle; removes nothing the ≤2 gate keeps)
      .where(abs(length(col("dname")) - length(col("cname"))) <= 2)
      .select(col("dname"), col("cname"), col("canon_id")).distinct()
      // banded early-exit edit distance: 3-arg levenshtein walks only a
      // 2k+1 diagonal band and returns -1 past the threshold — O(len·k)
      // per pair instead of O(len²), the dominant cost of this operator
      // on candidate-heavy blocks. Survivors' distances are exact, so
      // the oracle's plain levenshtein ≤ 2 selects identical rows.
      .withColumn("dist",
        levenshtein(col("dname"), col("cname"), 2).cast(IntegerType))
      .where(col("dist") >= 0)
      .withColumn("rk", row_number().over(wBest))
      .where(col("rk") === 1)
    // broadcast-back: dictionary verdicts rejoin the dirty dictionary
    // (and through it the fact rows it aggregates)
    dirty.join(broadcast(matched), Seq("dname"))
      .select(col("dirty_id"), col("dname"), col("canon_id"),
        col("cname"), col("dist"), col("n_rows"))
      .orderBy(col("dirty_id"))
  }

  val fuzzyLinkSql: String =
    """WITH canon AS (
      |  SELECT p_name AS cname, MIN(p_partkey) AS canon_id
      |  FROM part WHERE p_partkey % 2 = 0 GROUP BY p_name),
      |dirtyrows AS (
      |  SELECT p_partkey,
      |    substr(p_name, 1, CAST(p_partkey // 2 % (LENGTH(p_name) - 2) AS INT))
      |    || substr(p_name,
      |         CAST(p_partkey // 2 % (LENGTH(p_name) - 2) AS INT) + 2,
      |         LENGTH(p_name)) AS dname
      |  FROM part WHERE p_partkey % 2 = 1 AND LENGTH(p_name) >= 3),
      |dirty AS (
      |  SELECT dname, MIN(p_partkey) AS dirty_id, COUNT(*) AS n_rows
      |  FROM dirtyrows GROUP BY dname),
      |cgrams AS (
      |  SELECT cname, canon_id,
      |    unnest(list_distinct(list_transform(range(1, LENGTH(cname)),
      |      i -> substr(cname, CAST(i AS INT), 2)))) AS gram
      |  FROM canon),
      |freq AS (SELECT gram, COUNT(*) AS f FROM cgrams GROUP BY gram),
      |crare AS (
      |  SELECT gram, cname, canon_id FROM (
      |    SELECT g.gram, g.cname, g.canon_id,
      |      ROW_NUMBER() OVER (PARTITION BY g.cname
      |        ORDER BY f.f, g.gram) AS rk
      |    FROM cgrams g JOIN freq f ON f.gram = g.gram) t
      |  WHERE rk <= 3),
      |dgrams AS (
      |  SELECT dname,
      |    unnest(list_distinct(list_transform(range(1, LENGTH(dname)),
      |      i -> substr(dname, CAST(i AS INT), 2)))) AS gram
      |  FROM dirty),
      |drare AS (
      |  SELECT gram, dname FROM (
      |    SELECT g.gram, g.dname,
      |      ROW_NUMBER() OVER (PARTITION BY g.dname
      |        ORDER BY f.f, g.gram) AS rk
      |    FROM dgrams g JOIN freq f ON f.gram = g.gram) t
      |  WHERE rk <= 3),
      |cand AS (
      |  SELECT DISTINCT dr.dname, cr.cname, cr.canon_id
      |  FROM drare dr JOIN crare cr ON dr.gram = cr.gram
      |  WHERE abs(LENGTH(dr.dname) - LENGTH(cr.cname)) <= 2),
      |best AS (
      |  SELECT dname, cname, canon_id, dist FROM (
      |    SELECT dname, cname, canon_id,
      |      CAST(levenshtein(dname, cname) AS INTEGER) AS dist,
      |      ROW_NUMBER() OVER (PARTITION BY dname
      |        ORDER BY levenshtein(dname, cname), canon_id) AS rk
      |    FROM cand WHERE levenshtein(dname, cname) <= 2) t
      |  WHERE rk = 1)
      |SELECT d.dirty_id, d.dname, b.canon_id, b.cname, b.dist, d.n_rows
      |FROM dirty d JOIN best b ON b.dname = d.dname
      |ORDER BY d.dirty_id""".stripMargin
}
