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

  test("mm03 over the text corpus keeps the fallback path everywhere") {
    val df = Multimodal.decodeFeatures(spark, "/root/testdata/sf0.001")
    assert(df.where(col("decoded") =!= 0).count() === 0,
      "text payloads must not claim to be decodable images")
    assert(df.count() > 0)
  }
}
