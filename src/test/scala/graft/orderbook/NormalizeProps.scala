package graft.orderbook

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Property checks for the semantic invariants the reference enforces
  * operationally (SURVEY.md §5.3): explode conservation, at-least-once
  * dedup, seq-gap exactness, micro-batch-boundary invariance. Few cases
  * per property — each case is a real Spark job. */
object NormalizeProps extends Properties("normalize") {

  private lazy val spark = TestSpark.init()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private def strDf(cols: Seq[String], rows: Seq[Seq[String]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_: _*)), 2),
      StructType(cols.map(StructField(_, StringType))))

  private val ladderGen: Gen[List[(Int, Int)]] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(1, 99), Gen.chooseNum(0, 500))))

  private def ladderJson(l: List[(Int, Int)]): String =
    l.map { case (p, c) => s"[${p / 100.0},$c]" }.mkString("[", ",", "]")

  // (c) explode conservation: sum(contracts) and row count preserved
  property("explode conserves contracts and cardinality") =
    Prop.forAll(ladderGen, ladderGen) { (yes, no) =>
      val entries = strDf(
        Seq("redis_stream_id", "ingestion_ts", "market_ticker", "sid",
          "seq", "yes_dollars", "no_dollars"),
        Seq(Seq("1-1", "1000", "T", "1", "1", ladderJson(yes), ladderJson(no))))
      val out = Normalize.explodeSnapshots(
        Normalize.parseSnapshotEntries(entries))
      val total = out.agg(coalesce(sum("contracts"), lit(0L))).head.getLong(0)
      total == (yes ++ no).map(_._2.toLong).sum &&
        out.count() == (yes.size + no.size)
    }

  // (b) at-least-once dedup: duplicate any subset, counts restore
  property("dedup by stream id restores exact multiplicity") =
    Prop.forAll(Gen.someOf(1 to 12)) { dupIdx =>
      val base = (1 to 12).map(i =>
        Seq(s"$i-0", s"${1000 + i}", "T", "1", s"$i", "yes", "0.42", "1"))
      val rows = base ++ dupIdx.map(i => base(i - 1))
      val df = Normalize.parseDeltaEntries(strDf(
        Seq("redis_stream_id", "ingestion_ts", "market_ticker", "sid",
          "seq", "side", "price_dollars", "delta"), rows))
      Normalize.dedupReplays(df, Seq("redis_stream_id")).count() == 12L
    }

  // (d) seq-gap detector flags exactly the survivors of removed seqs
  property("seq-gap flags = successors-in-remaining of dropped seqs") =
    Prop.forAll(Gen.someOf(2 to 19)) { dropped =>
      val remaining = (1 to 20).filterNot(dropped.contains(_))
      val rows = remaining.map(i =>
        Seq(s"$i-0", s"${1000 + i}", "T", "1", s"$i", "yes", "0.42", "1"))
      val flagged = Normalize.seqGapFlags(
          Normalize.parseDeltaEntries(strDf(
            Seq("redis_stream_id", "ingestion_ts", "market_ticker", "sid",
              "seq", "side", "price_dollars", "delta"), rows)))
        .where(col("seq_gap")).select("seq").collect().map(_.getLong(0)).toSet
      val expected = remaining.sliding(2).collect {
        case scala.collection.Seq(a, b) if b != a + 1 => b.toLong
      }.toSet
      flagged == expected
    }

  // (a) micro-batch-boundary invariance: per-key sums are independent
  // of how the delta stream is split into batches
  property("grouped delta sums are batch-boundary invariant") =
    Prop.forAll(Gen.listOfN(24, Gen.chooseNum(-10, 10)),
        Gen.chooseNum(1, 23)) { (deltas, split) =>
      val cols = Seq("redis_stream_id", "ingestion_ts", "market_ticker",
        "sid", "seq", "side", "price_dollars", "delta")
      val rows = deltas.zipWithIndex.map { case (d, i) =>
        Seq(s"$i-0", s"${1000 + i}", s"T${i % 3}", "1", s"$i", "yes",
          s"0.4${i % 2}", s"$d")
      }
      val (b1, b2) = rows.splitAt(split)
      def sums(rs: Seq[Seq[String]]) =
        Normalize.flattenDeltas(Normalize.parseDeltaEntries(strDf(cols, rs)))
          .groupBy("ticker", "side", "price_dollars")
          .agg(sum("delta").as("s"))
      val merged = sums(b1).unionByName(sums(b2))
        .groupBy("ticker", "side", "price_dollars")
        .agg(sum("s").as("s"))
      val whole = sums(rows)
      merged.join(whole, Seq("ticker", "side", "price_dollars"))
        .where(merged("s") =!= whole("s")).count() == 0 &&
        merged.count() == whole.count()
    }
}
