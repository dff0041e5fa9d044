package graft.dedup

import java.nio.file.Files


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dd25 — incremental curation. The DuckDB gate already pins the big
  * theorem (store-based incremental derivation == full recompute over
  * the concatenated corpus, hash-exact). This spec pins what the gate
  * structurally can't:
  *  - the three fixture cases are actually LIVE (increment docs that
  *    join history clusters, form new in-increment clusters, and
  *    displace a history keeper) — without this, the equality could
  *    hold vacuously on a fixture where nothing merges;
  *  - the incremental stage NEVER RESCANS HISTORY TEXT: fed
  *    parquet-backed stores and increment, its plan's file scans
  *    exclude the documents table entirely;
  *  - the incremental EMITTER rewrites only changed (split, shard)
  *    partitions — unchanged partitions' files are byte-untouched
  *    (CurationEmitSpec's discipline, extended to the daily-append
  *    shape), and a from-files manifest recompute equals the gated
  *    updated manifest. */
class CurationIncSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val dir = "/root/testdata/sf0.001"

  test("fixture cases live: join with keeper retained, join with keeper " +
      "displaced, and new in-increment clusters") {
    val (sigStore, keepStore) = Dedup.dd25Stores(spark, dir)
    // candidate rows: node < 5e6 with node % 5 != 0 is a history
    // CLUSTER (its doc_id = yesterday's keeper); everything else is an
    // increment doc
    val merged = Dedup.incrementalCurationMergedFrom(spark,
        sigStore, keepStore, Dedup.dd25Inc(spark, dir))
      .select(col("node"), col("doc_id"), col("score"), col("cluster_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    def isHist(node: Long) = node < 5000000L && node % 5 != 0
    val byCluster = merged.groupBy(_._4)
    val multi = byCluster.filter(_._2.length >= 2)
    assert(multi.nonEmpty, "no increment doc merged with anything")

    def keeperOf(rows: Array[(Long, Long, Double, Long)]) =
      rows.minBy { case (_, id, score, _) => (-score, id) }

    // JOIN, history keeper RETAINED: a cluster with both sides whose
    // election lands on the history keeper
    val retained = multi.filter { case (_, rows) =>
      rows.exists(r => isHist(r._1)) && rows.exists(r => !isHist(r._1)) &&
        isHist(keeperOf(rows)._1)
    }
    assert(retained.nonEmpty,
      "no history keeper retained in any joined cluster")

    // JOIN, history keeper DISPLACED: same shape, election lands on an
    // increment doc
    val displaced = multi.filter { case (_, rows) =>
      rows.exists(r => isHist(r._1)) && rows.exists(r => !isHist(r._1)) &&
        !isHist(keeperOf(rows)._1)
    }
    assert(displaced.nonEmpty,
      "no history keeper displaced in any joined cluster")

    // NEW IN-INCREMENT CLUSTER: ≥2 members, none from history
    val fresh = multi.filter { case (_, rows) => rows.forall(r => !isHist(r._1)) }
    assert(fresh.nonEmpty, "no new cluster formed inside the increment")
  }

  test("the incremental stage's plan never scans history text") {
    val tmp = Files.createTempDirectory("graft-dd25-stores")
    tmp.toFile.deleteOnExit()
    val (sigStore, keepStore) = Dedup.dd25Stores(spark, dir)
    sigStore.write.mode("overwrite").parquet(s"$tmp/sig")
    keepStore.write.mode("overwrite").parquet(s"$tmp/keep")
    Dedup.dd25Inc(spark, dir).write.mode("overwrite").parquet(s"$tmp/inc")
    val fromParquet = Dedup.incrementalCurationSelectedFrom(spark,
      spark.read.parquet(s"$tmp/sig"), spark.read.parquet(s"$tmp/keep"),
      spark.read.parquet(s"$tmp/inc"))
    // analyzed (pre-AQE) plan: collect every file-backed relation.
    // Pin on the MERGED stage (pre-election): the selection tail's
    // plan is localCheckpoint-collapsed past the election seam (r19
    // reuse optimization), so its analyzed plan carries no file scans
    // at all and the no-documents assertion there would be vacuous.
    // The merged frame is where every input is still visible — the
    // CC stage's lineage is checkpoint-truncated, but its inputs were
    // these same frames; every remaining branch's scans show here.
    val merged = Dedup.incrementalCurationMergedFrom(spark,
      spark.read.parquet(s"$tmp/sig"), spark.read.parquet(s"$tmp/keep"),
      spark.read.parquet(s"$tmp/inc"))
    val scanned = merged.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scanned.nonEmpty, "no file scans found in the plan")
    assert(!scanned.exists(_.contains("documents")),
      s"incremental plan rescans history text: " +
        scanned.filter(_.contains("documents")).take(3).mkString(", "))
    // and the parquet-backed derivation is the same answer
    val viaStores = fromParquet.orderBy(col("doc_id"))
      .collect().map(_.toSeq).toSeq
    val inProcess = Dedup.incrementalCurationSelected(spark, dir)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(viaStores === inProcess,
      "parquet store roundtrip changed the selection")
  }

  test("multi-day associativity: day-1 then day-2 through the store " +
      "handoff equals one-shot incremental over the union") {
    val (sig0, keep0) = Dedup.dd25Stores(spark, dir)
    val inc = Dedup.dd25Inc(spark, dir)
    val inc1 = inc.where(col("doc_id") % 2 === 0)
    val inc2 = inc.where(col("doc_id") % 2 =!= 0)
    assert(inc1.count() > 0 && inc2.count() > 0, "degenerate day split")
    val oneShot = Dedup
      .incrementalCurationSelectedFrom(spark, sig0, keep0, inc)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val (sig1, keep1) = Dedup.dd25UpdatedStores(spark, sig0, keep0, inc1)
    val chained = Dedup
      .incrementalCurationSelectedFrom(spark, sig1, keep1, inc2)
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(chained === oneShot,
      "chained daily increments diverged from the one-shot update — " +
        "the store handoff lost an edge, an attribute, or a cluster id")
  }

  test("incremental emission rewrites only changed shards; a from-files " +
      "manifest recompute equals the gated updated manifest") {
    val out = Files.createTempDirectory("graft-dd25-emit")
    out.toFile.deleteOnExit()
    val (_, keepStore) = Dedup.dd25Stores(spark, dir)
    // yesterday's emission
    Dedup.curationSelectFrom(keepStore)
      .write.mode("overwrite").partitionBy("split", "shard")
      .parquet(out.toString)
    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(out.toFile).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val before = files()
    val man = Dedup.incrementalCurationManifest(spark, dir).collect()
    Dedup.emitCurationIncrement(spark, dir, out.toString)
    val after = files()

    val unchanged = man.filter(_.getAs[Int]("changed") == 0)
      .map(r => s"split=${r.getAs[String]("split")}/shard=${r.getAs[Long]("shard")}")
    assert(unchanged.nonEmpty, "fixture produced no unchanged shards")
    unchanged.foreach { p =>
      val b = before.filter(_._1.contains(p))
      val a = after.filter(_._1.contains(p))
      assert(b.nonEmpty, s"unchanged shard $p missing from yesterday")
      assert(a === b, s"unchanged shard $p was rewritten")
    }
    man.filter(r => r.getAs[Int]("changed") == 1 &&
        r.getAs[Long]("n_docs") == 0L).foreach { r =>
      val p = s"split=${r.getAs[String]("split")}/shard=${r.getAs[Long]("shard")}"
      assert(!after.keys.exists(_.contains(p)),
        s"emptied shard $p still has files")
    }

    // from-files recompute == the gated manifest's non-empty rows
    val M = 1000003L
    val mulRed = 2654435761L % M
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
    val gated = man.filter(_.getAs[Long]("n_docs") > 0L)
      .map(r => Seq(r.getAs[String]("split"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("id_checksum"))).toSeq
    assert(fromFiles === gated,
      s"emitted files disagree with the updated manifest")
  }
}
