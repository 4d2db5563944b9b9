package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{PlotSink, PngCodec}

/** The plot sink (reference S4) emits REAL truecolor PNGs: proven by
  * the JDK's independent ImageIO reader pixel-for-pixel, with byte
  * determinism and structural chart facts (axes drawn, every series'
  * color present, series separated) pinned.
  */
class PlotSinkSpec extends AnyFunSuite {

  private val s1 = Array(0.0, 3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0)
  private val s2 = Array(8.0, 2.0, 6.0, 4.0, 6.0, 0.0, 2.0, 7.0)

  private def decode(png: Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not parse the plot PNG")
    img
  }

  test("chart PNG parses in ImageIO with the requested dimensions") {
    val img = decode(PlotSink.lineChart(
      Seq("a" -> s1, "b" -> s2), 320, 200))
    assert(img.getWidth == 320 && img.getHeight == 200)
  }

  test("rendering is byte-deterministic") {
    val a = PlotSink.lineChart(Seq("a" -> s1, "b" -> s2))
    val b = PlotSink.lineChart(Seq("a" -> s1, "b" -> s2))
    assert(a.sameElements(b))
  }

  test("axes are drawn in black at the margin frame") {
    val img = decode(PlotSink.lineChart(Seq("a" -> s1)))
    // a point on the y axis above the data's start (series overdraw
    // the frame where a value sits on the baseline — by design)
    assert((img.getRGB(30, 40) & 0xffffff) == 0x000000)
    // bottom-right end of the x axis (s1's last value is not the min)
    assert((img.getRGB(320 - 30, 200 - 30) & 0xffffff) == 0x000000)
  }

  test("every series paints its own palette color, and ImageIO sees " +
      "the same pixel counts the raster holds") {
    val png = PlotSink.lineChart(Seq("a" -> s1, "b" -> s2))
    val img = decode(png)
    PlotSink.palette.take(2).foreach { case (r, g, b) =>
      val rgbInt = (r << 16) | (g << 8) | b
      var n = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        if ((img.getRGB(x, y) & 0xffffff) == rgbInt) n += 1
      assert(n > 10, s"series color ($r,$g,$b) barely present: $n px")
    }
    // third palette color must NOT appear (only two series plotted)
    val (r3, g3, b3) = PlotSink.palette(2)
    val rgb3 = (r3 << 16) | (g3 << 8) | b3
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert((img.getRGB(x, y) & 0xffffff) != rgb3,
        s"unplotted series color present at ($x,$y)")
  }

  test("constant series renders on the shared baseline without a " +
      "divide-by-zero") {
    val img = decode(PlotSink.lineChart(
      Seq("flat" -> Array(5.0, 5.0, 5.0, 5.0))))
    val (r, g, b) = PlotSink.palette(0)
    var n = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) & 0xffffff) == ((r << 16) | (g << 8) | b))
        n += 1
    assert(n > 0)
  }

  test("encodeRgb output round-trips through ImageIO pixel-for-pixel") {
    val (w, h) = (7, 5)
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 53 + 17) % 256).toByte)
    val img = decode(PngCodec.encodeRgb(w, h, rgb))
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      val expected = ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) |
        (rgb(i + 2) & 0xff)
      assert((img.getRGB(x, y) & 0xffffff) == expected,
        s"pixel ($x,$y) differs from ImageIO's read of encodeRgb")
    }
  }
}
