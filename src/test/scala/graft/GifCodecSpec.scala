package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GifCodec

/** GifCodec is a REAL GIF87a/89a codec with real variable-width LZW,
  * not a private serialization: both directions are proven against the
  * JDK's independent ImageIO GIF plugin, including an image large
  * enough to push the code table to its 4096-entry limit (12-bit codes
  * + clear/reset mid-stream).
  */
class GifCodecSpec extends AnyFunSuite {

  /** 16-color palette with distinct, asymmetric channel values. */
  private val pal16: Array[Byte] =
    Array.tabulate(48)(i => ((i / 3) * 16 + (i % 3) * 5).toByte)

  private def sampleIdx(w: Int, h: Int, n: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 31 + 7) % n).toByte)

  test("encode -> decode round-trips indices exactly (small images)") {
    for ((w, h) <- Seq((1, 1), (3, 2), (7, 5), (16, 16))) {
      val idx = sampleIdx(w, h, 16)
      val img = GifCodec.decode(GifCodec.encode(w, h, pal16, idx))
      assert(img.width == w && img.height == h)
      assert(img.indices.sameElements(idx), s"mismatch at ${w}x$h")
    }
  }

  test("non-power-of-two palettes pad the color table correctly") {
    val pal5 = pal16.take(15) // 5 colors
    val idx = sampleIdx(9, 4, 5)
    val img = GifCodec.decode(GifCodec.encode(9, 4, pal5, idx))
    assert(img.indices.sameElements(idx))
    assert(img.palette.take(15).sameElements(pal5))
  }

  test("large image exercises 12-bit codes and clear-on-full reset") {
    // 256x256 with a 3-run varying pattern: >64k pixels forces the
    // table past 4096 entries, so the stream must grow to 12-bit
    // codes, emit a mid-stream clear, and rebuild — the whole LZW
    // state machine, not just the toy path.
    val (w, h) = (256, 256)
    val idx = Array.tabulate(w * h) { i =>
      (((i.toLong * i) / 7 + i / 3) % 16).toByte
    }
    val gif = GifCodec.encode(w, h, pal16, idx)
    val img = GifCodec.decode(gif)
    assert(img.indices.sameElements(idx), "big-image LZW round trip")
    // And ImageIO agrees on every pixel of the same bytes.
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gif))
    assert(jdk != null, "ImageIO could not parse our big GIF")
    var k = 0
    while (k < w * h) {
      val p = 3 * (idx(k) & 0xff)
      val expected = ((pal16(p) & 0xff) << 16) |
        ((pal16(p + 1) & 0xff) << 8) | (pal16(p + 2) & 0xff)
      assert((jdk.getRGB(k % w, k / w) & 0xffffff) == expected,
        s"pixel $k differs from ImageIO's read-back")
      k += 1
    }
  }

  test("our encoder's bytes are a valid GIF for the JDK ImageIO reader") {
    val (w, h) = (7, 4)
    val idx = sampleIdx(w, h, 16)
    val gif = GifCodec.encode(w, h, pal16, idx)
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gif))
    assert(jdk != null, "ImageIO could not parse our GIF")
    assert(jdk.getWidth == w && jdk.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = 3 * (idx(y * w + x) & 0xff)
      val expected = ((pal16(p) & 0xff) << 16) |
        ((pal16(p + 1) & 0xff) << 8) | (pal16(p + 2) & 0xff)
      assert((jdk.getRGB(x, y) & 0xffffff) == expected,
        s"pixel ($x,$y) differs from ImageIO's read-back")
    }
  }

  test("our decoder reads a GIF written by the JDK ImageIO writer") {
    // The JDK writer may reorder the palette and emit 89a extensions;
    // compare RGB values through each side's own palette.
    val (w, h) = (6, 5)
    val idx = sampleIdx(w, h, 16)
    val cm = new java.awt.image.IndexColorModel(4, 16,
      Array.tabulate[Byte](16)(i => pal16(3 * i)),
      Array.tabulate[Byte](16)(i => pal16(3 * i + 1)),
      Array.tabulate[Byte](16)(i => pal16(3 * i + 2)))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w) {
      val p = 3 * (idx(y * w + x) & 0xff)
      img.setRGB(x, y, ((pal16(p) & 0xff) << 16) |
        ((pal16(p + 1) & 0xff) << 8) | (pal16(p + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos),
      "JDK has no GIF writer?")
    val dec = GifCodec.decode(bos.toByteArray)
    assert(dec.width == w && dec.height == h)
    val rgb = dec.toRgb
    for (y <- 0 until h; x <- 0 until w) {
      val p = 3 * (idx(y * w + x) & 0xff)
      val i = 3 * (y * w + x)
      assert((rgb(i) & 0xff) == (pal16(p) & 0xff) &&
        (rgb(i + 1) & 0xff) == (pal16(p + 1) & 0xff) &&
        (rgb(i + 2) & 0xff) == (pal16(p + 2) & 0xff),
        s"pixel ($x,$y) differs from what ImageIO wrote")
    }
  }

  test("corrupt inputs fail loudly") {
    val good = GifCodec.encode(3, 3, pal16, sampleIdx(3, 3, 16))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException] { GifCodec.decode(badMagic) }
    intercept[IllegalArgumentException] {
      GifCodec.decode(good.take(10)) // truncated header
    }
    // Trailer with no image descriptor.
    val noImage = good.take(13 + 48) ++ Array(0x3b.toByte)
    intercept[IllegalArgumentException] { GifCodec.decode(noImage) }
  }

  test("a file truncated inside the color table fails loudly, not black") {
    // round-9 advisory fix: copyOfRange zero-pads past EOF, which would
    // silently decode a black palette — the codec must reject instead.
    // Header is 13 bytes, then the 16-entry global table needs 48; cut
    // mid-table.
    val good = GifCodec.encode(3, 3, pal16, sampleIdx(3, 3, 16))
    val cutGlobal = good.take(13 + 20)
    val e = intercept[IllegalArgumentException] { GifCodec.decode(cutGlobal) }
    assert(e.getMessage.contains("truncated GIF global color table"),
      e.getMessage)
  }
}
