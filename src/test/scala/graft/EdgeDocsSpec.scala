package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus robustness: every documents/embeddings-backed
  * query must COMPLETE over empty, whitespace-only, single-char, and
  * pathologically repetitive documents — the rows a 100 TB crawl
  * always contains and the sf corpora never do. (Correct values on the
  * healthy corpus are the oracle gate's job; this pins the absence of
  * sequence()-descending explosions, divide-by-zero aborts, and
  * empty-array fold crashes on the unhealthy one.) */
class EdgeDocsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  /** Tiny pathological stream shared by both fixture dirs: lone events,
    * identical timestamps, a single user, snapshot anchors (id%10==0)
    * present and absent; ts is INT64 nanos exactly like the driver's
    * parquet. (The docs dir needs it too: op06 prunes an events-backed
    * star schema, and `op*` is in the docs test's prefix set.) */
  private def writeDegenerateEvents(p: java.nio.file.Path): Unit = {
    import spark.implicits._
    Seq(
      (0L, 1704067200000000000L, 3L, "view", 1.0, "{}"),
      (1L, 1704067200000000000L, 3L, "click", 0.0, "{}"),  // same ns ts
      (2L, 1704067201000000000L, 3L, "purchase", 2.5, "{}"),
      (10L, 1704067202000000000L, 3L, "view", 0.0, "{}"),
      (11L, 1704153700000000000L, 3L, "error", -1.0, "{}") // next day
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$p/events.parquet")
  }

  private lazy val dir: String = {
    val p = Files.createTempDirectory("graft-edge")
    p.toFile.deleteOnExit()
    import spark.implicits._
    writeDegenerateEvents(p)
    Seq(
      (0L, "", "en", "s0", 0L),                     // empty
      (1L, " ", "de", "s1", 1L),                    // whitespace only
      (2L, "x", "es", "s0", 1L),                    // single char
      (3L, "ab", "fr", "s1", 2L),                   // below every n-gram
      (4L, "one two three four five six seven eight nine ten eleven",
        "zh", "s0", 55L),                           // ordinary
      (5L, "dup dup dup dup dup dup dup dup dup dup dup",
        "en", "s1", 43L)                            // max repetition
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$p/documents.parquet")
    (0 until 40).map(i =>
        (i.toLong, Array.fill(8)((i % 5 + 1).toFloat), s"l${i % 3}"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$p/embeddings.parquet")
    // degenerate part catalog for the part-backed dd queries (dd11):
    // empty / 1-char / 2-char names on BOTH halves (no interior char to
    // delete, no bigram), duplicate names, and a couple of healthy ones
    Seq(
      (0L, "", "B", "T", 1, 1.0),
      (1L, "a", "B", "T", 1, 1.0),
      (2L, "ab", "B", "T", 1, 1.0),
      (3L, "xy", "B", "T", 1, 1.0),
      (4L, "same name part", "B", "T", 1, 1.0),
      (6L, "same name part", "B", "T", 1, 1.0),
      (5L, "another part label", "B", "T", 1, 1.0),
      (7L, "third part label", "B", "T", 1, 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$p/part.parquet")
    // degenerate orders for the orders-backed op queries (op03):
    // a single status (pruning selects everything or nothing) and an
    // extreme price
    Seq(
      (0L, 0L, "F", 0.0, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"),
        "1-URGENT"),
      (1L, 0L, "F", 1e9, java.sql.Timestamp.valueOf("1995-01-02 00:00:00"),
        "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$p/orders.parquet")
    // degenerate lineitem for the runtime-filter join (op04): a key that
    // matches the urgent order, one that matches nothing (bloom-pruned),
    // and zero quantity
    Seq(
      (0L, 0L, 0L, 1, 0.0, 0.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1995-01-03 00:00:00")),
      (0L, 1L, 1L, 2, 7.0, 1.0, 0.1, 0.0, "R", "F",
        java.sql.Timestamp.valueOf("1995-01-04 00:00:00")),
      (99L, 2L, 2L, 1, 3.0, 2.0, 0.0, 0.0, "A", "F",
        java.sql.Timestamp.valueOf("1995-01-05 00:00:00"))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$p/lineitem.parquet")
    p.toString
  }

  private lazy val eventsDir: String = {
    val p = Files.createTempDirectory("graft-edge-ev")
    p.toFile.deleteOnExit()
    writeDegenerateEvents(p)
    p.toString
  }

  test("every events-backed query survives a degenerate stream") {
    val names = SparkEntry.queries.keys.filter(n =>
      n.startsWith("ob") || n.startsWith("q15") || n.startsWith("q16") ||
        n.startsWith("q21") || n.startsWith("q26") ||
        n.startsWith("q30") || n.startsWith("q58") ||
        n.startsWith("q61") ||
        n.startsWith("q63") || n.startsWith("q65") ||
        n.startsWith("q71") || n.startsWith("q73") ||
        n.startsWith("q74") || n.startsWith("q75") ||
        n.startsWith("st02") || n.startsWith("st03") ||
        n.startsWith("st04") || n.startsWith("st05") ||
        n.startsWith("st06") ||
        n.startsWith("st07") ||
        n.startsWith("st08") ||
        n.startsWith("st09") ||
        n.startsWith("st10") ||
        n.startsWith("st11") ||
        n.startsWith("st12") ||
        n.startsWith("st13") ||
        n.startsWith("st14") ||
        n.startsWith("st15")) // the deltas-backed streaming replays
    assert(names.nonEmpty)
    names.foreach { n =>
      val rows =
        try SparkEntry.queries(n)(spark, eventsDir).collect()
        catch {
          case e: Throwable =>
            fail(s"$n crashed on degenerate events: ${e.getMessage}", e)
        }
      assert(rows != null, n)
    }
  }

  test("every documents/embeddings-backed query survives degenerate docs") {
    val names = SparkEntry.queries.keys.filter(n =>
      n.startsWith("txt") || n.startsWith("dd") || n.startsWith("mm") ||
        n.startsWith("sim") || n.startsWith("op") ||
        n.startsWith("q59") || n.startsWith("q60") || n.startsWith("q62") ||
        n.startsWith("st01")) // the embeddings-backed streaming replay
    assert(names.nonEmpty)
    names.foreach { n =>
      val rows =
        try SparkEntry.queries(n)(spark, dir).collect()
        catch {
          case e: Throwable =>
            fail(s"$n crashed on degenerate docs: ${e.getMessage}", e)
        }
      assert(rows != null, n)
    }
  }
}
