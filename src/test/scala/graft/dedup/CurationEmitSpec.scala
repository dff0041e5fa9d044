package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dd24's manifest must describe the bytes a writer actually ships:
  * emit the selected corpus with `write.partitionBy(split, shard)`,
  * recompute the manifest FROM THE WRITTEN FILES, and require equality
  * with the gated manifest. Catches every way the emission could drift
  * from the audit — a lost row in the writer, a hash re-derivation
  * mismatch, a partition column type change. */
class CurationEmitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("a manifest recomputed from the emitted files equals the " +
      "gated dd24 manifest") {
    val M = 1000003L
    val mulRed = 2654435761L % M
    val out = Files.createTempDirectory("graft-curation-emit")
    out.toFile.deleteOnExit()
    Dedup.curationSelected(spark, dir)
      .write.mode("overwrite").partitionBy("split", "shard")
      .parquet(out.toString)
    val fromFiles = spark.read.parquet(out.toString)
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        sum((col("doc_id") % M * mulRed + 99991L) % M).cast("long")
          .as("id_checksum"))
      .select(col("split"), col("shard").cast("long").as("shard"),
        col("n_docs"), col("n_tokens"), col("id_checksum"))
      .orderBy(col("split"), col("shard"))
      .collect().map(_.toSeq).toSeq
    val gated = Dedup.curationManifest(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fromFiles.nonEmpty, "emission wrote no rows")
    assert(fromFiles === gated,
      s"emitted files disagree with the gated manifest:\n" +
        s"files: $fromFiles\ngated: $gated")
    // layout pin: one directory per (split, shard) pair in the manifest
    val splitDirs = out.toFile.listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("split="))
    assert(splitDirs.nonEmpty, "no split= partition directories written")
    val pairDirs = splitDirs.flatMap(sd => sd.listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")))
    assert(pairDirs.length === gated.size,
      "partition directory count != manifest row count")
  }
}
