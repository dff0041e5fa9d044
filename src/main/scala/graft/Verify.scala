package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only — the driver passes 2):
    // comma-separated name prefixes to restrict the dump to
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    // A crashing query must be a RED row in the artifact, not a missing
    // one (round-7 lesson: catch-and-skip let 41 analysis-time crashes
    // read as "102/102 green"). On failure we still create the query's
    // output dir and drop an _ERROR file with the message, so any
    // downstream reader that expects parquet there fails loudly on that
    // key instead of silently not iterating it.
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        val d = Paths.get(s"$outDir/$name")
        Files.createDirectories(d)
        Files.writeString(d.resolve("_ERROR"),
          s"$name\n${e.toString}\n")
      }
      // same per-query cache hygiene as Bench (shared definition)
      GraftSession.resetCaches(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.exists(k.startsWith)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable failure summary alongside the dumps — a gate that
    // only counts green parquet dirs can cross-check against this.
    Files.writeString(Paths.get(s"$outDir/_failures.json"),
      failed.map(q).mkString("[", ",", "]"))
    // NOTE: exit stays 0 even with failures — the _ERROR marker dirs and
    // _failures.json make each crash a red row; a nonzero rc could make
    // the driver discard the whole artifact instead.
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} queries FAILED: " +
        failed.mkString(", "))
    spark.stop()
  }
}
