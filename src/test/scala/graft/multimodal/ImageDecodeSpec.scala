package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** mm03's decode is REAL for images: a PNG generated in-memory (no
  * binary checked in — PNG encoding is deterministic enough for this
  * round-trip because we decode it right back) must come out of the
  * distributed decode stage with its true dimensions, channel count,
  * and hand-computable pixel statistics, while a text payload in the
  * same frame takes the byte-stream fallback. */
class ImageDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.init()

  /** 3×2 RGB PNG with known samples: pixel (x,y) = (10x, 20y, 30). */
  private def pngBytes(): Array[Byte] = {
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3)
      img.setRGB(x, y, (10 * x << 16) | (20 * y << 8) | 30)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("a real PNG decodes to true raster features through the Spark stage") {
    import spark.implicits._
    val rows = Seq(
      DecodeStub.MediaRow(1L, "image", pngBytes()),
      DecodeStub.MediaRow(2L, "image", "not an image".getBytes("UTF-8")))
    val got = Multimodal
      .decodeFrames(spark, rows.toDF("media_id", "kind", "payload"))
      .collect().sortBy(_.media_id)

    val png = got(0)
    assert(png.decoded === 1 && png.width === 3 && png.height === 2 &&
      png.channels === 3, s"PNG header misread: $png")
    // expected stats over samples in row-major, channel-minor order
    val samples = for (y <- 0 until 2; x <- 0 until 3;
      v <- Seq(10 * x, 20 * y, 30)) yield v
    assert(png.mean_byte === samples.sum.toDouble / samples.size)
    assert(png.checksum ===
      samples.foldLeft(0L)((h, v) => (h * 31 + v) % 1000000007L))
    assert(png.n_bytes === pngBytes().length)

    val txt = got(1)
    assert(txt.decoded === 0 && txt.width === -1 && txt.channels === -1)
    // fallback = byte-stream features, bit-identical to DecodeStub
    val stub = DecodeStub.decode(rows(1))
    assert(txt.mean_byte === stub.mean_byte && txt.checksum === stub.checksum)
  }

  test("a real PNG resizes to the target raster (and re-decodes cleanly)") {
    val half = ImageDecode.resize(pngBytes(), 2, 1)
      .getOrElse(fail("resize refused a valid PNG"))
    val back = ImageDecode.decode(DecodeStub.MediaRow(3L, "image", half))
    assert(back.decoded === 1 && back.width === 2 && back.height === 1 &&
      back.channels === 3, s"resized image misread: $back")
    // non-image payloads keep the metadata-only fallback
    assert(ImageDecode.resize("plain text".getBytes("UTF-8"), 2, 1).isEmpty)
  }

  test("bilinearChannel: exact 2x downscale is the rounded 4-mean; " +
      "same-size is identity; edges clamp") {
    val src = Array.tabulate(16)(i => (i * 13 + 7) % 256) // 4x4
    val half = ImageDecode.bilinearChannel(src, 4, 4, 2, 2)
    for (y <- 0 until 2; x <- 0 until 2) {
      val (a, b) = (src(2 * y * 4 + 2 * x), src(2 * y * 4 + 2 * x + 1))
      val (c, d) = (src((2 * y + 1) * 4 + 2 * x),
        src((2 * y + 1) * 4 + 2 * x + 1))
      assert(half(y * 2 + x) === (a + b + c + d + 2) / 4,
        s"closed form diverged at ($x,$y)")
    }
    assert(ImageDecode.bilinearChannel(src, 4, 4, 4, 4).toSeq === src.toSeq,
      "same-size resample must be the identity")
    // 1x1 -> NxN upscale: everything clamps to the single source pixel
    assert(ImageDecode.bilinearChannel(Array(200), 1, 1, 3, 3).toSeq ===
      Seq.fill(9)(200))
  }

  test("rasterRoundtrip: codec stages are lossless and match the pure " +
      "arithmetic the oracle computes") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val got = ImageDecode.rasterRoundtrip(42L, payload)
    assert(got.decoded === 1, "an imageio stage failed")
    // mirror the oracle: pixel i = byte i mod n; out = (a+b+c+d+2)//4
    val n = payload.length
    val pix = Array.tabulate(256)(i => payload(i % n) & 0xff)
    def fold(a: Array[Int]): Long =
      a.foldLeft(0L)((c, v) => (c * 31 + v) % 1000000007L)
    assert(got.in_checksum === fold(pix),
      "PNG encode/decode was not lossless on the source raster")
    val out = Array.tabulate(64) { j =>
      val (x, y) = (j % 8, j / 8)
      (pix(2 * y * 16 + 2 * x) + pix(2 * y * 16 + 2 * x + 1)
        + pix((2 * y + 1) * 16 + 2 * x)
        + pix((2 * y + 1) * 16 + 2 * x + 1) + 2) / 4
    }
    assert(got.out_checksum === fold(out),
      "resize through the codec diverged from the exact 2x closed form")
  }

  test("mm03 over the text corpus keeps the fallback path everywhere") {
    val df = Multimodal.decodeFeatures(spark, "/root/testdata/sf0.001")
    assert(df.where(col("decoded") =!= 0).count() === 0,
      "text payloads must not claim to be decodable images")
    assert(df.count() > 0)
  }
}
