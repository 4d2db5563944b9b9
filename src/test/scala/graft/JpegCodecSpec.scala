package graft

import graft.ops.JpegCodec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import org.scalatest.funsuite.AnyFunSuite

/** JPEG is lossy, so conformance is agreement with an INDEPENDENT
  * decoder on the same bytes: every image here is encoded by the JDK's
  * ImageIO JPEG writer, then decoded by BOTH ImageIO and JpegCodec, and
  * compared per-sample. The measured cross-decoder deltas come from
  * different IDCT roundings (±1-2) plus chroma-upsampling policy on
  * subsampled color (ImageIO interpolates, JpegCodec uses nearest) —
  * bounds below sit just above the measured values for smooth content.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def encode(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def maxDelta(bytes: Array[Byte]): (Int, Double) = {
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val got = JpegCodec.decode(bytes)
    assert(got.width == ref.getWidth && got.height == ref.getHeight,
      s"dims ${got.width}x${got.height} vs ${ref.getWidth}x${ref.getHeight}")
    var worst = 0
    var sum = 0.0
    var n = 0
    val gray = ref.getType == BufferedImage.TYPE_BYTE_GRAY
    for (y <- 0 until got.height; x <- 0 until got.width) {
      val a = got.rgb(y * got.width + x)
      if (gray) {
        // compare RAW samples: ImageIO's getRGB would run the gray
        // color space through an sRGB gamma conversion the raw JPEG
        // samples never saw
        val d = math.abs((a & 0xff) - ref.getRaster.getSample(x, y, 0))
        worst = math.max(worst, d)
        sum += d; n += 1
      } else {
        val b = ref.getRGB(x, y) & 0xffffff
        for (sh <- Seq(16, 8, 0)) {
          val d = math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff))
          worst = math.max(worst, d)
          sum += d; n += 1
        }
      }
    }
    (worst, sum / n)
  }

  private def gradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(1, w - 1)
      val g = (y * 255) / math.max(1, h - 1)
      val b = ((x + y) * 255) / math.max(1, w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  test("color gradient agrees with ImageIO's decoder (smooth content)") {
    val (worst, mean) = maxDelta(encode(gradient(64, 48), 0.92f))
    info(f"color 64x48: worst=$worst mean=$mean%.3f")
    assert(worst <= 12 && mean < 2.0, s"worst=$worst mean=$mean")
  }

  test("grayscale agrees tightly (no chroma path)") {
    val img = new BufferedImage(40, 40, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 40; x <- 0 until 40) {
      val g = (128 + 100 * math.sin(x / 5.0) * math.cos(y / 7.0)).toInt
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val (worst, mean) = maxDelta(encode(img, 0.9f))
    info(f"gray 40x40: worst=$worst mean=$mean%.3f")
    assert(worst <= 2 && mean < 1.0, s"worst=$worst mean=$mean")
  }

  test("non-MCU-multiple dimensions decode the full visible area") {
    val (worst, mean) = maxDelta(encode(gradient(37, 21), 0.95f))
    info(f"color 37x21: worst=$worst mean=$mean%.3f")
    // small images have a high edge fraction, where nearest-vs-
    // interpolated chroma upsampling differs most — measured mean 2.48
    assert(worst <= 12 && mean < 3.5, s"worst=$worst mean=$mean")
  }

  test("quality sweep stays bounded (lossiness varies, agreement holds)") {
    for (q <- Seq(0.5f, 0.75f, 0.95f)) {
      val (worst, mean) = maxDelta(encode(gradient(48, 32), q))
      info(f"q=$q: worst=$worst mean=$mean%.3f")
      assert(worst <= 14 && mean < 2.5, s"q=$q worst=$worst mean=$mean")
    }
  }

  test("progressive JPEG is rejected loudly") {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(gradient(32, 32), null, null), p)
    ios.close(); w.dispose()
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decode(bos.toByteArray)
    }
    assert(e.getMessage.contains("progressive"), e.getMessage)
  }

  // ---- encoder (write half): our bytes, independent decoders ----

  private def graySamples(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      (128 + 90 * math.sin(x / 6.0) * math.cos(y / 5.0)).toInt
    }

  test("encodeGray bytes decode in ImageIO to the source within lossy bound") {
    val (w, h) = (50, 34) // non-MCU-multiple
    val src = graySamples(w, h)
    val bytes = JpegCodec.encodeGray(w, h, src, quality = 90)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h,
      "ImageIO rejected our JPEG")
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(ref.getRaster.getSample(x, y, 0) - src(y * w + x))
      worst = math.max(worst, d)
    }
    info(s"encode q90 reconstruction worst=$worst")
    assert(worst <= 12, s"lossy reconstruction off by $worst")
  }

  test("our decoder agrees with ImageIO on our own bytes") {
    val (w, h) = (41, 23)
    val bytes = JpegCodec.encodeGray(w, h, graySamples(w, h), quality = 80)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val got = JpegCodec.decode(bytes)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((got.rgb(y * w + x) & 0xff) -
        ref.getRaster.getSample(x, y, 0))
      worst = math.max(worst, d)
    }
    info(s"cross-decoder on our bytes worst=$worst")
    assert(worst <= 2, s"decoders disagree by $worst on our own stream")
  }

  test("encode is byte-deterministic and quality scales size/fidelity") {
    val (w, h) = (32, 32)
    val src = graySamples(w, h)
    val a = JpegCodec.encodeGray(w, h, src, 85)
    val b = JpegCodec.encodeGray(w, h, src, 85)
    assert(java.util.Arrays.equals(a, b), "nondeterministic encode")
    val lo = JpegCodec.encodeGray(w, h, src, 20)
    val hi = JpegCodec.encodeGray(w, h, src, 95)
    assert(lo.length < hi.length,
      s"q20 ${lo.length}B should be smaller than q95 ${hi.length}B")
    def worstVs(bytes: Array[Byte]): Int = {
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      (for (y <- 0 until h; x <- 0 until w)
        yield math.abs(ref.getRaster.getSample(x, y, 0) - src(y * w + x))).max
    }
    val (wLo, wHi) = (worstVs(lo), worstVs(hi))
    info(s"q20 worst=$wLo q95 worst=$wHi")
    assert(wHi < wLo, "higher quality must reconstruct better")
  }

  test("restart markers round-trip through both decoders") {
    // RSTn was live-but-untested decoder code until this: encode with a
    // 3-MCU restart interval (several RST0..RSTn cycles across 30
    // MCUs), then require BOTH ImageIO and our decoder read it and
    // agree — proving the byte-align + DC-predictor-reset path on each
    // side of the codec
    val (w, h) = (48, 40) // 6x5 = 30 MCUs, interval 3 -> 9 markers
    val src = graySamples(w, h)
    val bytes = JpegCodec.encodeGray(w, h, src, quality = 88,
      restartInterval = 3)
    assert(bytes.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 &&
        (p(1) & 0xff) <= 0xd7) >= 9, "expected RSTn markers in stream")
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth == w, "ImageIO rejected RST stream")
    val got = JpegCodec.decode(bytes)
    var worstCross = 0
    var worstSrc = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = ref.getRaster.getSample(x, y, 0)
      worstCross = math.max(worstCross,
        math.abs((got.rgb(y * w + x) & 0xff) - r))
      worstSrc = math.max(worstSrc, math.abs(r - src(y * w + x)))
    }
    info(s"restart stream: cross-decoder worst=$worstCross, " +
      s"reconstruction worst=$worstSrc")
    assert(worstCross <= 2, s"decoders disagree by $worstCross")
    assert(worstSrc <= 12, s"reconstruction off by $worstSrc")
  }

  test("corrupt inputs fail loudly") {
    val good = encode(gradient(16, 16), 0.9f)
    intercept[IllegalArgumentException] {
      JpegCodec.decode("nope".getBytes)
    }
    intercept[IllegalArgumentException] {
      JpegCodec.decode(good.take(20)) // truncated before SOS
    }
    // arithmetic coding under a baseline SOF0: a DAC segment spliced in
    // right after SOI must die with the named error, not a later NPE
    val dac = Array[Byte](0xff.toByte, 0xcc.toByte, 0, 4, 0, 0)
    val spliced = good.take(2) ++ dac ++ good.drop(2)
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decode(spliced)
    }
    assert(e.getMessage.contains("arithmetic"), e.getMessage)
    // a scan referencing a Huffman slot that was never defined must fail
    // at SOS with the named error, not decode garbage: strip every DHT
    val noDht = {
      val b = good
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      var i = 0
      while (i < b.length) {
        if (i + 3 < b.length && (b(i) & 0xff) == 0xff &&
            (b(i + 1) & 0xff) == 0xc4) {
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          i += 2 + len
        } else { out += b(i); i += 1 }
      }
      out.toArray
    }
    val e2 = intercept[IllegalArgumentException] {
      JpegCodec.decode(noDht)
    }
    assert(e2.getMessage.contains("never defined"), e2.getMessage)
  }
}
