package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.orderbook.Fixtures

class ConnectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  test("replay source + subscription filter restrict the feed to discovered tickers") {
    val in = Files.createTempDirectory("graft-conn-in")
    val ck = Files.createTempDirectory("graft-conn-ck")
    Files.write(in.resolve("messages.ndjson"), Fixtures.ndjsonLines.asJava)
    val discovery = new Connectors.StaticTickers(Seq("KXTEST-A", "KXTEST-C"))
    val source = new Connectors.FileReplaySource(in.toString)
    val q = Connectors.subscribed(source.messages(spark), discovery)
      .writeStream.format("memory").queryName("subscribed_msgs")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("subscribed_msgs")
      .select("msg.market_ticker").distinct()
      .collect().map(_.getString(0)).toSet
    assert(got === Set("KXTEST-A", "KXTEST-C"))
    assert(spark.table("subscribed_msgs").count() ===
      Fixtures.messages.count(_.fold(_.ticker, _.ticker) != "KXTEST-B"))
  }
}
