package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Real BMP codec for uncompressed 24-bit images — the third real
  * media codec of the multimodal family (PNG pixels: [[PngCodec]];
  * RIFF/PCM WAV: [[WavCodec]]). Both directions speak the actual
  * Windows BMP wire format: 14-byte BITMAPFILEHEADER ('BM', file
  * size, pixel-array offset), 40-byte BITMAPINFOHEADER (BI_RGB,
  * biBitCount=24), pixel rows stored BOTTOM-UP in BGR order with each
  * row padded to a 4-byte boundary. The encoder's output opens in any
  * image viewer; the decoder validates the magic, header sizes, bit
  * depth and compression tag, honors the header's pixel-array offset
  * (so files with palette/ICC gaps still read), and supports both
  * bottom-up (positive height) and top-down (negative height) row
  * orders — so it reads 24-bit BMPs produced by any real encoder, not
  * just its own (BmpCodecSpec proves both directions against the
  * JDK's ImageIO BMP plugin). Pure byte arrays in/out, no driver
  * state — designed for typed `mapPartitions`, scan-local at any
  * scale.
  */
object BmpCodec {

  /** Decoded image: RGB interleaved, row-major, TOP-DOWN. */
  final case class Rgb(width: Int, height: Int, pixels: Array[Byte])

  private def rowSize(width: Int): Int = (3 * width + 3) / 4 * 4

  /** Encode RGB (top-down, interleaved) as a 24-bit bottom-up BMP. */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height,
      s"expected ${3 * width * height} bytes, got ${rgb.length}")
    val stride = rowSize(width)
    val imgSize = stride * height
    val buf = ByteBuffer.allocate(14 + 40 + imgSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(14 + 40 + imgSize) // file size
      .putShort(0).putShort(0)   // reserved
      .putInt(14 + 40)           // pixel array offset
    buf.putInt(40)               // BITMAPINFOHEADER size
      .putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1)               // planes
      .putShort(24)              // bits per pixel
      .putInt(0)                 // BI_RGB (uncompressed)
      .putInt(imgSize)
      .putInt(2835).putInt(2835) // 72 dpi in pixels/metre
      .putInt(0).putInt(0)       // palette sizes
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val i = 3 * (y * width + x)
        buf.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i)) // BGR
        x += 1
      }
      var pad = stride - 3 * width
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP to top-down RGB. */
  def decode(bmp: Array[Byte]): Rgb = {
    require(bmp.length >= 54, s"truncated BMP: ${bmp.length} bytes")
    val buf = ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B'.toByte && buf.get(1) == 'M'.toByte,
      "bad BMP magic")
    val pixelOffset = buf.getInt(10)
    val headerSize = buf.getInt(14)
    require(headerSize >= 40, s"unsupported DIB header size $headerSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24, s"unsupported bit depth $bpp (24-bit only)")
    require(compression == 0, s"unsupported compression $compression")
    val stride = rowSize(width)
    require(bmp.length >= pixelOffset + stride * height,
      s"pixel array truncated: need ${pixelOffset + stride * height}, " +
        s"have ${bmp.length}")
    val out = new Array[Byte](3 * width * height)
    var row = 0
    while (row < height) {
      // file rows run bottom-up unless the height was negative
      val y = if (topDown) row else height - 1 - row
      val base = pixelOffset + row * stride
      var x = 0
      while (x < width) {
        val i = 3 * (y * width + x)
        out(i + 2) = bmp(base + 3 * x)     // B
        out(i + 1) = bmp(base + 3 * x + 1) // G
        out(i)     = bmp(base + 3 * x + 2) // R
        x += 1
      }
      row += 1
    }
    Rgb(width, height, out)
  }
}
