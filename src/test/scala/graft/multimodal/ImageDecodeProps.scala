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

  private val rasterGen: Gen[(Int, Int, Array[Int], Int, Int)] = for {
    sw <- Gen.chooseNum(1, 12)
    sh <- Gen.chooseNum(1, 12)
    px <- Gen.listOfN(sw * sh, Gen.chooseNum(0, 255))
    dw <- Gen.chooseNum(1, 12)
    dh <- Gen.chooseNum(1, 12)
  } yield (sw, sh, px.toArray, dw, dh)

  property("bilinearChannel: range-bounded, constant-preserving, " +
      "identity at same size, exact 4-mean at 2x down") =
    Prop.forAll(rasterGen) { case (sw, sh, px, dw, dh) =>
      val out = ImageDecode.bilinearChannel(px, sw, sh, dw, dh)
      // convexity: every output pixel is a convex combination (exact
      // fixed-point weights summing to 2^16) of inputs, so it must lie
      // inside the source's [min, max] envelope
      val (lo, hi) = (px.min, px.max)
      val bounded = out.forall(v => v >= lo && v <= hi)
      // a constant raster resamples to the same constant at ANY size
      val const = ImageDecode.bilinearChannel(
        Array.fill(sw * sh)(px(0)), sw, sh, dw, dh)
        .forall(_ == px(0))
      val ident = ImageDecode.bilinearChannel(px, sw, sh, sw, sh)
        .sameElements(px)
      val halve =
        if (sw % 2 == 0 && sh % 2 == 0) {
          val half = ImageDecode
            .bilinearChannel(px, sw, sh, sw / 2, sh / 2)
          (0 until sh / 2).forall(y => (0 until sw / 2).forall { x =>
            half(y * sw / 2 + x) == (px(2 * y * sw + 2 * x)
              + px(2 * y * sw + 2 * x + 1)
              + px((2 * y + 1) * sw + 2 * x)
              + px((2 * y + 1) * sw + 2 * x + 1) + 2) / 4
          })
        } else true
      bounded :| s"out of [$lo,$hi] envelope: ${out.toSeq}" &&
        const :| "constant raster not preserved" &&
        ident :| "same-size resample not the identity" &&
        halve :| "2x downscale diverged from the 4-mean closed form"
    }
}
