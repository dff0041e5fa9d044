package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property check for the real decoder: ANY small RGB image encoded to
  * PNG must decode back (PNG is lossless) to exactly the raster
  * features computed from the source pixels — dimensions, channel
  * count, mean sample, and the polynomial sample checksum in
  * row-major, channel-minor order. Driver-side (no Spark job per
  * case): the decode function is the same one the distributed
  * mapPartitions stage calls, so the property transfers. */
object ImageDecodeProps extends Properties("imagedecode") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val imageGen: Gen[(Int, Int, List[Int])] = for {
    w <- Gen.chooseNum(1, 9)
    h <- Gen.chooseNum(1, 9)
    px <- Gen.listOfN(w * h, Gen.chooseNum(0, 0xffffff))
  } yield (w, h, px)

  property("png round-trips to exact raster features") =
    Prop.forAll(imageGen) { case (w, h, px) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, px(y * w + x))
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      val got = ImageDecode.decode(
        DecodeStub.MediaRow(7L, "image", out.toByteArray))
      // expected stats straight from the generated pixels
      val samples = for {
        y <- 0 until h; x <- 0 until w
        v <- Seq((px(y * w + x) >> 16) & 0xff, (px(y * w + x) >> 8) & 0xff,
          px(y * w + x) & 0xff)
      } yield v
      val mean = samples.sum.toDouble / samples.size
      val checksum =
        samples.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L)
      (got.decoded == 1) :| "decoded" &&
        (got.width == w && got.height == h && got.channels == 3) :| "dims" &&
        (got.mean_byte == mean) :| s"mean ${got.mean_byte} != $mean" &&
        (got.checksum == checksum) :| s"checksum ${got.checksum} != $checksum"
    }
}
