package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bounded-state replay dedup: duplicates injected WITHIN a batch,
  * ACROSS batches (checkpointed state), and as a full-epoch replay must
  * all be suppressed; fresh ids must all survive (no false positives at
  * this fill factor — deterministic, so asserted exactly); and the
  * state cost stays one fixed-size cell per ticker regardless of how
  * many ids flow through. */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  private def msgs(ids: Range, ticker: String): Seq[BloomDedup.Msg] =
    ids.map(i => BloomDedup.Msg(ticker, s"$ticker-sid-$i", i.toLong, s"p$i"))

  test("replays are suppressed exactly; fresh ids all survive; state " +
    "is one fixed cell per ticker") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-bloom-in")
    val ck = java.nio.file.Files.createTempDirectory("graft-bloom-ck")
    in.toFile.deleteOnExit(); ck.toFile.deleteOnExit()
    // transformWithState needs RocksDB; TestSpark's session is shared
    // across suites, so restore the previous provider on exit — later
    // streaming suites must not silently inherit this one's choice
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {

    // batch 1: ids 0..99 for two tickers, ids 10..19 duplicated in-batch
    // batch 2: full replay of batch 1 (restart-from-0) + fresh 100..149
    def write(name: String, rows: Seq[BloomDedup.Msg], age: Long): Unit = {
      val lines = rows.map(m =>
        s"""{"ticker":"${m.ticker}","lineageId":"${m.lineageId}","seq":${m.seq},"payload":"${m.payload}"}""")
      val p = in.resolve(name)
      java.nio.file.Files.write(p, scala.jdk.CollectionConverters
        .SeqHasAsJava(lines).asJava)
      p.toFile.setLastModified(System.currentTimeMillis() - age)
    }
    val b1 = (msgs(0 until 100, "AAA") ++ msgs(10 until 20, "AAA") ++
      msgs(0 until 100, "BBB"))
    val b2 = (msgs(0 until 100, "AAA") ++ msgs(100 until 150, "AAA") ++
      msgs(0 until 100, "BBB") ++ msgs(100 until 150, "BBB"))
    write("b1.ndjson", b1, 60000L)
    write("b2.ndjson", b2, 0L)

    val src = spark.readStream
      .schema("ticker STRING, lineageId STRING, seq LONG, payload STRING")
      .option("maxFilesPerTrigger", 1)
      .json(in.toString)
      .as[BloomDedup.Msg]
    val q = BloomDedup.run(spark, src)
      .writeStream.format("memory").queryName("bloom_dedup")
      .outputMode("update")
      .option("checkpointLocation", s"$ck/_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.table("bloom_dedup").as[BloomDedup.Msg].collect()
    // every lineage id exactly once — in-batch dup, cross-batch replay,
    // and epoch replay all suppressed; zero false negatives by
    // construction, zero false positives at this fill (deterministic)
    val perId = out.groupBy(m => (m.ticker, m.lineageId)).view.mapValues(_.size)
    assert(perId.values.forall(_ == 1),
      s"duplicates emitted: ${perId.filter(_._2 > 1).keys.take(5).toSeq}")
    assert(out.count(_.ticker == "AAA") === 150)
    assert(out.count(_.ticker == "BBB") === 150)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("false-positive rate at design fill stays near the 1% target " +
    "and duplicates are never emitted (no false negatives, ever)") {
    // pure data-structure property check, no stream: insert 6500 ids
    // (the 8 KiB cell's design capacity), then probe 10k fresh ids
    val cfg = BloomDedup.Config()
    val bits = new Array[Byte](cfg.mBits / 8)
    val setBit = (p: Int) => {
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7)).toByte).toByte }
    val probesOf =
      (id: String) => BloomDedup.probes(id, cfg.mBits, cfg.k)
    (0 until 6500).foreach(i => probesOf(s"ins-$i").foreach(setBit))
    val fp = (0 until 10000).count { i =>
      probesOf(s"fresh-$i").forall(p => (bits(p >>> 3) & (1 << (p & 7))) != 0)
    }
    assert(fp < 300, s"false-positive rate ${fp / 100.0}% far above design 1%")
    // false negatives are structurally impossible: every inserted id's
    // bits are set, so re-probing any inserted id always answers "seen"
    (0 until 6500).foreach { i =>
      assert(probesOf(s"ins-$i").forall(p =>
        (bits(p >>> 3) & (1 << (p & 7))) != 0), s"false negative at ins-$i")
    }
  }
}
