package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.BmpCodec

/** BmpCodec is a REAL 24-bit BMP codec, not a private serialization:
  * both directions are proven against the JDK's independent ImageIO
  * BMP plugin, plus structural and property checks.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def samplePixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)

  test("encode -> decode round-trips pixels exactly (padded widths)") {
    // w=2..5 exercises every stride padding (6,9,12,15 -> pad 2,3,0,1)
    for (w <- 2 to 5; h <- 1 to 4) {
      val px = samplePixels(w, h)
      val img = BmpCodec.decode(BmpCodec.encode(w, h, px))
      assert(img.width == w && img.height == h)
      assert(img.pixels.sameElements(px), s"mismatch at ${w}x$h")
    }
  }

  test("our encoder's bytes are a valid BMP for the JDK ImageIO reader") {
    val (w, h) = (5, 3)
    val px = samplePixels(w, h)
    val bmp = BmpCodec.encode(w, h, px)
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bmp))
    assert(jdk != null, "ImageIO could not parse our BMP")
    assert(jdk.getWidth == w && jdk.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      val expected = ((px(i) & 0xff) << 16) | ((px(i + 1) & 0xff) << 8) |
        (px(i + 2) & 0xff)
      assert((jdk.getRGB(x, y) & 0xffffff) == expected,
        s"pixel ($x,$y) differs from ImageIO's read-back")
    }
  }

  test("our decoder reads a BMP written by the JDK ImageIO writer") {
    val (w, h) = (4, 3)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = samplePixels(w, h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      img.setRGB(x, y, ((px(i) & 0xff) << 16) | ((px(i + 1) & 0xff) << 8) |
        (px(i + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos),
      "JDK has no BMP writer?")
    val decoded = BmpCodec.decode(bos.toByteArray)
    assert(decoded.width == w && decoded.height == h)
    assert(decoded.pixels.sameElements(px),
      "pixels differ from what ImageIO wrote")
  }

  test("decoder supports top-down (negative height) row order") {
    val (w, h) = (3, 2)
    val px = samplePixels(w, h)
    val bottomUp = BmpCodec.encode(w, h, px)
    // flip to top-down: negate height, reverse the row blocks in place
    val stride = (3 * w + 3) / 4 * 4
    val td = bottomUp.clone()
    val buf = java.nio.ByteBuffer.wrap(td)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -h)
    val off = buf.getInt(10)
    for (r <- 0 until h)
      System.arraycopy(bottomUp, off + (h - 1 - r) * stride,
        td, off + r * stride, stride)
    val img = BmpCodec.decode(td)
    assert(img.pixels.sameElements(px), "top-down decode differs")
  }

  test("corrupt inputs fail loudly") {
    val good = BmpCodec.encode(2, 2, samplePixels(2, 2))
    intercept[IllegalArgumentException] {
      BmpCodec.decode(good.take(20)) // truncated
    }
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException] { BmpCodec.decode(badMagic) }
    val badDepth = good.clone()
    java.nio.ByteBuffer.wrap(badDepth)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
    intercept[IllegalArgumentException] { BmpCodec.decode(badDepth) }
  }
}
