package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()
  private val sf = "/root/testdata/sf0.001"

  test("media schema: opaque binary payload + typed metadata struct") {
    val m = Multimodal.media(spark, sf)
    assert(m.schema("payload").dataType === BinaryType)
    val meta = m.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq ===
      Seq("width", "height", "sample_rate", "n_frames", "mime"))
  }

  test("decode stub: features match a hand-computed payload") {
    val f = DecodeStub.decode(DecodeStub.MediaRow(7L, "image",
      "abc".getBytes("UTF-8")))
    assert(f.n_bytes === 3)
    assert(f.mean_byte === (97 + 98 + 99) / 3.0)
    assert(f.checksum === ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("mapPartitions decode preserves rows 1:1 and runs distributed") {
    val media = Multimodal.media(spark, sf)
    val feats = Multimodal.decodeFeatures(spark, sf)
    assert(feats.count() === media.count())
    // features join back onto their source rows with matching byte counts
    val joined = feats.join(media, "media_id")
      .where(col("n_bytes") =!= length(col("payload")))
    assert(joined.count() === 0)
  }

  test("frame sampler emits ceil(n_frames/2) frames per video") {
    val n = Multimodal.media(spark, sf).where(col("kind") === "video")
      .select(sum(ceil(col("meta.n_frames") / 2))).head.getLong(0)
    assert(Multimodal.frameSample(spark, sf).count() === n)
  }

  test("corpus text is pure ASCII — the byte≡codepoint premise of the " +
    "mm03/mm05 oracles") {
    // PHashStub/DecodeStub hash raw BYTES while the DuckDB oracles walk
    // CODEPOINTS; the two agree only while every document is ASCII
    // (also: mm05's near-copy injection round-trips payload→string).
    // Testdata generation is driver-owned — if multibyte text ever
    // ships, this failure names the assumption instead of a bare
    // oracle hash mismatch.
    val nonAscii = graft.Tables.documents(spark, sf)
      .where(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(nonAscii === 0L,
      "documents contain multibyte text: mm03/mm05 byte-vs-codepoint " +
        "oracle parity no longer holds — rework the oracles before " +
        "trusting their hashes")
  }
}
