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
    // PHash.hashBytes/DecodeStub hash raw BYTES while the DuckDB oracles walk
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

  /** The property the DCT pHash was adopted FOR (round-14 verdict item
    * 4): a uniform brightness shift moves only the DC coefficient,
    * which the 63-bit AC hash excludes — so a brightened copy of a
    * real image still collides under mm05's Hamming ≤ 6 verify, while
    * the old block-mean-over-encoded-bytes stand-in scatters (the
    * re-encoded PNG shares no byte layout with its source). */
  test("DCT pHash: brightness-shifted image collides; block-mean fails") {
    // The copy is brightness-shifted AND re-encoded in a different
    // container (PNG original, JPEG copy) — the transform a media-dedup
    // pipeline actually faces. Byte-level hashes cannot cross a
    // re-encode at all (both PNG and JPEG difference-code a pure
    // brightness shift, so SAME-format bytes barely move — measured
    // hamming 0-1 — but CROSS-format streams share nothing); the DCT
    // hash reads decoded content, where the shift only moves the
    // excluded DC coefficient and JPEG quantization noise stays small.
    // natural-image-like content: low-passed deterministic noise has a
    // broad ~1/f spectrum, so the 63 AC coefficients spread WELL AWAY
    // from their median and JPEG quantization noise can't flip bits
    // wholesale (a pure gradient/sinusoid concentrates energy in a few
    // bins and parks the rest ON the median — measured 10+ bit flips)
    val base: Array[Array[Int]] = {
      var seed = 12345L
      def next(): Int = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        ((seed >>> 40) & 0xff).toInt
      }
      var img = Array.fill(32, 32)(next())
      for (_ <- 0 until 3) { // 3x separable box blur, radius 2, wrap
        val h = Array.tabulate(32, 32)((y, x) =>
          (-2 to 2).map(d => img(y)((x + d + 32) % 32)).sum / 5)
        img = Array.tabulate(32, 32)((y, x) =>
          (-2 to 2).map(d => h((y + d + 32) % 32)(x)).sum / 5)
      }
      img
    }
    def enc(shift: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until 32; x <- 0 until 32) {
        // stretch the blurred noise to 30..225, leaving +20 headroom
        val v = 30 + (base(y)(x) * 195) / 255
        r.setSample(x, y, 0, v + shift)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val (orig, bright) = (enc(0, "png"), enc(20, "jpg"))
    val (hOrig, hBright) =
      (PHash.hashImage(orig).get, PHash.hashImage(bright).get)
    val dctHamming = java.lang.Long.bitCount(hOrig ^ hBright)
    assert(dctHamming <= 6,
      s"DCT pHash not brightness-robust: hamming $dctHamming > 6")
    // the superseded block-mean hash over the ENCODED bytes (the exact
    // round-≤14 algorithm, kept here as the counterexample)
    def blockMean(p: Array[Byte]): Long = {
      val n = p.length
      val total = p.map(_ & 0xff).map(_.toLong).sum
      (0 until 32).foldLeft(0L) { (sig, c) =>
        val (start, end) = (c * n / 32, (c + 1) * n / 32)
        val s = (start until end).map(j => (p(j) & 0xff).toLong).sum
        if (s * n > total * (end - start)) sig | (1L << c) else sig
      }
    }
    val bmHamming =
      java.lang.Long.bitCount(blockMean(orig) ^ blockMean(bright))
    assert(bmHamming > 6,
      s"block-mean unexpectedly robust (hamming $bmHamming) — " +
        "counterexample fixture degenerate")
    // sanity: a structurally different image is NOT a near-dup
    val other = {
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until 32; x <- 0 until 32)
        r.setSample(x, y, 0, if (((x / 4) + (y / 4)) % 2 == 0) 40 else 220)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val hOther = PHash.hashImage(other).get
    assert(java.lang.Long.bitCount(hOrig ^ hOther) > 6)
    // the total-function contract: text bytes take the byte fallback
    val txt = "no reader claims plain text".getBytes("UTF-8")
    assert(PHash.hashImage(txt).isEmpty)
    assert(PHash.payloadHash(txt) === PHash.hashBytes(txt))
  }

  /** The defining CDC property mm07 exists for: boundaries depend only
    * on local content, so a one-byte PREFIX insertion (the worst case
    * for a fixed grid, which re-digests every downstream chunk) leaves
    * most chunk digests intact. Runs [[Multimodal.chunkDedup]]'s exact
    * cutter expression over a two-row corpus: a payload and its
    * prefix-shifted twin. */
  test("mm07 chunking is content-defined: prefix insert keeps most chunks") {
    import spark.implicits._
    // LCG content, not periodic: a short-period payload can alias the
    // 8-byte window into zero (or degenerate) boundary phases
    val base = Iterator.iterate(42L)(x => (x * 6364136223846793005L + 1442695040888963407L))
      .drop(1).take(600).map(x => ('a' + math.floorMod(x >>> 33, 26)).toChar).mkString
    val rows = Seq((1L, base), (2L, "X" + base)).toDF("media_id", "text")
      .select(col("media_id"), col("text").cast(BinaryType).as("payload"))
    val dg = Multimodal.cdcChunkDigests(rows)
    val a = dg.where(col("media_id") === 1).select("dg").as[String].collect().toSet
    val b = dg.where(col("media_id") === 2).select("dg").as[String].collect().toSet
    assert(a.size > 5, s"degenerate chunking: only ${a.size} chunks")
    val survived = (a intersect b).size.toDouble / a.size
    assert(survived >= 0.5,
      f"only ${survived * 100}%.0f%% of chunk digests survived a 1-byte " +
        "prefix insert — the cutter is not content-defined")
    // and the fixed-grid counterexample: aligned 64-byte chunks share
    // (almost) nothing after the same shift, proving the property is
    // the cutter's, not the data's
    val fixed = rows.select(col("media_id"), explode(expr(
      """transform(
           sequence(0, cast(greatest(ceil(length(hex(payload)) / 128.0) - 1, 0) as int)),
           i -> md5(substring(hex(payload), i * 128 + 1, 128)))"""))
      .as("dg"))
    val fa = fixed.where(col("media_id") === 1).select("dg").as[String].collect().toSet
    val fb = fixed.where(col("media_id") === 2).select("dg").as[String].collect().toSet
    assert((fa intersect fb).size <= 1,
      "fixed-grid chunks unexpectedly survived the shift — probe data " +
        "is degenerate, pick a different payload")
  }
}
