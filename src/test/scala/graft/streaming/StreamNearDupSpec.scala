package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The st17 operator in isolation: a duplicate arriving in a LATER
  * micro-batch must be flagged against the band owner from an earlier
  * one (the cross-batch state fold is the whole point of the
  * operator), and an unrelated document sharing no band stays
  * admitted. */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  test("a cross-batch duplicate is claimed by its earlier owner; " +
      "unrelated text stays admitted") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-snd-in")
    val out = Files.createTempDirectory("graft-snd-out")
    in.toFile.deleteOnExit(); out.toFile.deleteOnExit()
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val freshText = "completely unrelated wording with different shingles"
    def stage(rows: Seq[(Long, String)], name: String, age: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-snd-stage")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p =>
        p.getFileName.toString.startsWith("part-")).findFirst.get
      Files.move(part, in.resolve(name))
      in.resolve(name).toFile.setLastModified(
        System.currentTimeMillis() - age)
    }
    stage(Seq((1L, dupText)), "b1.parquet", 120000)
    stage(Seq((2L, dupText), (3L, freshText)), "b2.parquet", 60000)
    val q = StreamNearDup.admit(spark,
        spark.readStream
          .schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1).parquet(in.toString))
      .writeStream.format("memory").queryName("snd_unit")
      .outputMode("update")
      .option("checkpointLocation", s"$out/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val verdicts = spark.table("snd_unit").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("claimed_by")))
    // doc 1: owns all 4 of its bands; doc 2 (identical text, LATER
    // batch): every band already claimed by doc 1; doc 3: fresh
    assert(verdicts.count(_ == (1L, 1L)) === StreamNearDup.Bands)
    assert(verdicts.count(_ == (2L, 1L)) === StreamNearDup.Bands,
      s"cross-batch duplicate not claimed by its owner: ${verdicts.toSeq}")
    assert(verdicts.filter(_._1 == 3L).forall(_._2 == 3L),
      s"unrelated doc lost a band to a non-duplicate: ${verdicts.toSeq}")
  }
}
