package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Layout + determinism contracts for the op16 emission writer
  * ([[Sampling.shardLayout]]): exactly N shard directories with ONE
  * file each, count balance within the multinomial envelope, the same
  * rows as the input, byte-reproducible order under one seed, and a
  * DIFFERENT permutation under another — the cross-run-reproducible
  * shuffle a tokenizer/trainer handoff needs. */
class SamplingShardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private def freshDir(tag: String): String = {
    val p = Files.createTempDirectory(s"graft_shard_$tag")
    p.toFile.deleteOnExit()
    p.resolve("out").toString
  }

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, (i % 997) + 10)).toDF("doc_id", "n_chars")
  }

  private def shardDirs(out: String): Seq[java.io.File] =
    new java.io.File(out).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .sortBy(_.getName)

  test("writer: N directories, one file each, balanced, same rows") {
    val docs = corpus(100000)
    val out = freshDir("layout")
    Sampling.shardLayout(docs, Sampling.ShardN)
      .write.partitionBy("shard").parquet(out)
    val dirs = shardDirs(out)
    assert(dirs.size === Sampling.ShardN, s"expected ${Sampling.ShardN} shards")
    val files = dirs.map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.forall(_ === 1),
      s"each shard must be ONE file (one task wrote it): $files")
    // count balance: hash-multinomial at 100k/16 ≈ 6250 ± ~80 — a 10%
    // envelope is ~8 sigma, loose enough to never flake, tight enough
    // to catch a broken mix (all-one-shard would be 16x over)
    val counts = spark.read.parquet(out).groupBy(col("shard"))
      .count().collect().map(_.getLong(1))
    val mean = counts.sum.toDouble / counts.length
    assert(counts.forall(c => math.abs(c - mean) < 0.1 * mean),
      s"shard counts out of the 10% envelope: ${counts.toSeq}")
    // same rows out (layout rewrite, not a transform)
    assert(spark.read.parquet(out).select(col("doc_id"), col("n_chars"))
      .except(docs).isEmpty && docs.except(
        spark.read.parquet(out).select(col("doc_id"), col("n_chars")))
      .isEmpty)
  }

  test("one seed reproduces the emission row-for-row; another seed is " +
      "a different permutation") {
    val docs = corpus(20000)
    def emit(seed: Long): Seq[Seq[Long]] = {
      val out = freshDir(s"seed$seed")
      Sampling.shardLayout(docs, 8, seed)
        .write.partitionBy("shard").parquet(out)
      // per-shard doc_id sequence IN FILE ORDER (parquet preserves it)
      shardDirs(out).map { d =>
        spark.read.parquet(d.getPath).select(col("doc_id"))
          .collect().map(_.getLong(0)).toSeq
      }
    }
    val a1 = emit(Sampling.ShardSeed)
    val a2 = emit(Sampling.ShardSeed)
    assert(a1 === a2, "same seed must reproduce shard contents in order")
    val b = emit(12345L)
    assert(b !== a1, "a different seed must permute differently")
    // ... but still carry the same corpus overall
    assert(b.flatten.sorted === a1.flatten.sorted)
  }
}
