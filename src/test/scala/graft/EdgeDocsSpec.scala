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

  private lazy val dir: String = {
    val p = Files.createTempDirectory("graft-edge")
    p.toFile.deleteOnExit()
    import spark.implicits._
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
    p.toString
  }

  test("every documents/embeddings-backed query survives degenerate docs") {
    val names = SparkEntry.queries.keys.filter(n =>
      n.startsWith("txt") || n.startsWith("dd") || n.startsWith("mm") ||
        n.startsWith("sim") || n.startsWith("op"))
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
