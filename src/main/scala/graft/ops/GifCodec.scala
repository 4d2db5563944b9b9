package graft.ops

import scala.collection.mutable

/** Real GIF codec — the fourth real media codec of the multimodal
  * family (PNG pixels: [[PngCodec]]; RIFF/PCM WAV: [[WavCodec]];
  * 24-bit BMP: [[BmpCodec]]). Both directions speak the actual GIF
  * wire format: GIF87a header, logical-screen descriptor, global
  * color table, image descriptor, and — the real work — the GIF
  * variant of LZW with variable-width codes (LSB-first bit packing,
  * clear/EOI codes, width growth 2..12 bits, clear-on-full at 4096)
  * chunked into ≤255-byte data sub-blocks. The encoder's output opens
  * in any image viewer; the decoder also reads files produced by
  * other encoders (GIF89a headers, graphic-control/application
  * extensions are skipped, local color tables honored) —
  * GifCodecSpec proves both directions against the JDK's ImageIO GIF
  * plugin, including images large enough to exercise code-width
  * growth to 12 bits and the table-full clear/reset path. Pure byte
  * arrays in/out, no driver state — designed for typed
  * `mapPartitions`, scan-local at any scale.
  */
object GifCodec {

  /** Decoded indexed image: palette as interleaved RGB triples,
    * indices row-major top-down (GIF is always top-down when not
    * interlaced).
    */
  final case class Indexed(width: Int, height: Int,
      palette: Array[Byte], indices: Array[Byte]) {
    /** Expand to interleaved top-down RGB. */
    def toRgb: Array[Byte] = {
      val out = new Array[Byte](3 * width * height)
      var i = 0
      while (i < width * height) {
        val p = 3 * (indices(i) & 0xff)
        out(3 * i) = palette(p)
        out(3 * i + 1) = palette(p + 1)
        out(3 * i + 2) = palette(p + 2)
        i += 1
      }
      out
    }
  }

  private def ceilLog2(n: Int): Int = {
    var b = 1
    while ((1 << b) < n) b += 1
    b
  }

  /** Encode an indexed image as GIF87a. `palette` holds RGB triples
    * (2..256 entries); every index must be < palette size. The global
    * color table is padded to the next power of two as the format
    * requires.
    */
  def encode(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte]): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length >= 6 &&
      palette.length <= 768, s"palette must be 2..256 RGB triples")
    val nColors = palette.length / 3
    require(indices.length == width * height,
      s"expected ${width * height} indices, got ${indices.length}")
    var v = 0
    while (v < indices.length) {
      require((indices(v) & 0xff) < nColors,
        s"index ${indices(v) & 0xff} at $v exceeds palette size $nColors")
      v += 1
    }
    val gctBits = math.max(1, ceilLog2(nColors)) // field stores bits-1
    val gctSize = 1 << gctBits
    val out = new mutable.ArrayBuilder.ofByte
    out ++= "GIF87a".getBytes("US-ASCII")
    // Logical screen descriptor (little-endian u16 dims).
    out += (width & 0xff).toByte += ((width >> 8) & 0xff).toByte
    out += (height & 0xff).toByte += ((height >> 8) & 0xff).toByte
    // Packed: GCT present | color resolution (bits-1) | sort=0 | size.
    out += (0x80 | ((gctBits - 1) << 4) | (gctBits - 1)).toByte
    out += 0.toByte // background color index
    out += 0.toByte // pixel aspect ratio: none
    // Global color table, padded with black to the power-of-two size.
    out ++= palette
    var pad = 3 * (gctSize - nColors)
    while (pad > 0) { out += 0.toByte; pad -= 1 }
    // Image descriptor at (0,0), no local table, not interlaced.
    out += 0x2c.toByte
    out += 0.toByte += 0.toByte += 0.toByte += 0.toByte
    out += (width & 0xff).toByte += ((width >> 8) & 0xff).toByte
    out += (height & 0xff).toByte += ((height >> 8) & 0xff).toByte
    out += 0.toByte
    // LZW-compressed pixel data.
    val mcs = math.max(2, ceilLog2(nColors))
    out += mcs.toByte
    val lzw = compress(indices, mcs)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out += n.toByte
      var i = 0
      while (i < n) { out += lzw(off + i); i += 1 }
      off += n
    }
    out += 0.toByte    // block terminator
    out += 0x3b.toByte // trailer
    out.result()
  }

  /** GIF-LZW compress: variable code width starting at mcs+1,
    * LSB-first packing, leading clear code, EOI terminator, and a
    * clear/reset when the table fills at 4096 codes.
    */
  private def compress(data: Array[Byte], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new mutable.ArrayBuilder.ofByte
    var acc = 0L
    var nBits = 0
    var width = mcs + 1
    // (prefixCode << 8 | nextByte) -> code; singles are implicit.
    var dict = new mutable.HashMap[Int, Int]
    var next = eoi + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out += (acc & 0xff).toByte
        acc >>>= 8
        nBits -= 8
      }
      // Canonical GIF width schedule (check AFTER emitting, against the
      // PRE-add table size): the code that first overflows the old
      // width is still written at the old width; the bump applies from
      // the next code on. Both real decoders (ImageIO, giflib) expect
      // exactly this point.
      if (next > (1 << width) - 1 && width < 12) width += 1
    }
    emit(clear)
    if (data.nonEmpty) {
      var w = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        dict.get(w << 8 | k) match {
          case Some(c) => w = c
          case None =>
            emit(w)
            if (next < 4096) {
              dict(w << 8 | k) = next
              next += 1
            } else {
              emit(clear)
              dict = new mutable.HashMap[Int, Int]
              next = eoi + 1
              width = mcs + 1
            }
            w = k
        }
        i += 1
      }
      emit(w)
    }
    emit(eoi)
    if (nBits > 0) out += (acc & 0xff).toByte
    out.result()
  }

  /** Decode a GIF (87a or 89a), returning the FIRST image. Extensions
    * are skipped; a local color table, when present, overrides the
    * global one; interlaced images (the JDK writer's default) are
    * de-interlaced.
    */
  def decode(bytes: Array[Byte]): Indexed = {
    require(bytes.length >= 13, "truncated GIF")
    val magic = new String(bytes, 0, 6, "US-ASCII")
    require(magic == "GIF87a" || magic == "GIF89a",
      s"bad GIF signature '$magic'")
    var pos = 6
    def u8: Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16: Int = { val v = (bytes(pos) & 0xff) |
      ((bytes(pos + 1) & 0xff) << 8); pos += 2; v }
    u16; u16 // logical screen dims (per-image dims are authoritative)
    val lsdPacked = u8
    u8; u8 // background index, aspect ratio
    var palette: Array[Byte] = Array.emptyByteArray
    if ((lsdPacked & 0x80) != 0) {
      val n = 1 << ((lsdPacked & 7) + 1)
      // copyOfRange silently zero-pads past EOF, which would decode a
      // truncated file with a black palette — fail loudly instead
      require(pos + 3 * n <= bytes.length,
        s"truncated GIF global color table ($n entries at $pos)")
      palette = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    while (true) {
      u8 match {
        case 0x21 => // extension: label then sub-blocks, skip all
          u8
          var n = u8
          while (n != 0) { pos += n; n = u8 }
        case 0x2c =>
          u16; u16 // image left, top
          val w = u16
          val h = u16
          val packed = u8
          val interlaced = (packed & 0x40) != 0
          if ((packed & 0x80) != 0) {
            val n = 1 << ((packed & 7) + 1)
            require(pos + 3 * n <= bytes.length,
              s"truncated GIF local color table ($n entries at $pos)")
            palette = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
            pos += 3 * n
          }
          require(palette.nonEmpty, "GIF image with no color table")
          val mcs = u8
          // Concatenate the data sub-blocks into one LZW stream.
          val lzw = new mutable.ArrayBuilder.ofByte
          var n = u8
          while (n != 0) {
            var i = 0
            while (i < n) { lzw += bytes(pos + i); i += 1 }
            pos += n
            n = u8
          }
          val seq = decompress(lzw.result(), mcs, w * h)
          // Interlaced GIFs (the JDK writer's default) store rows in
          // four passes (every 8th from 0, every 8th from 4, every 4th
          // from 2, every 2nd from 1); de-interlacing is a pure row
          // permutation after the LZW stream is decoded.
          val idx = if (!interlaced) seq else {
            val order = (0 until h by 8) ++ (4 until h by 8) ++
              (2 until h by 4) ++ (1 until h by 2)
            val out = new Array[Byte](w * h)
            var i = 0
            while (i < h) {
              System.arraycopy(seq, i * w, out, order(i) * w, w)
              i += 1
            }
            out
          }
          return Indexed(w, h, palette, idx)
        case 0x3b =>
          throw new IllegalArgumentException("GIF contains no image")
        case b =>
          throw new IllegalArgumentException(f"unexpected GIF block $b%02x")
      }
    }
    sys.error("unreachable")
  }

  /** GIF-LZW decompress `nOut` pixels. Mirrors `compress` exactly:
    * same width-growth point (table size reaching 1<<width), same
    * stop-adding-at-4096 discipline, plus the KwKwK case (a code equal
    * to the table's next slot refers to prev + prev's first byte).
    */
  private def decompress(data: Array[Byte], mcs: Int,
      nOut: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new Array[Byte](nOut)
    var outPos = 0
    val prefix = new Array[Int](4096)   // parent code, -1 for singles
    val suffix = new Array[Byte](4096)  // appended byte
    val length = new Array[Int](4096)   // entry length in bytes
    var next = 0
    var width = mcs + 1
    // Codes read since the last clear, offset like the table counter
    // (giflib's RunningCode): the width schedule follows codes READ,
    // not entries added — the two differ by one because the first code
    // after a clear adds nothing, and this is exactly the encoder's
    // check-after-emit point.
    var rc = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) {
        prefix(i) = -1; suffix(i) = i.toByte; length(i) = 1
        i += 1
      }
      next = eoi + 1
      rc = eoi + 1
      width = mcs + 1
    }
    reset()
    // Write table entry `c` ending at out[end-1] by walking parents.
    def expand(c: Int): Int = {
      val len = length(c)
      require(outPos + len <= nOut,
        s"LZW stream overruns image: ${outPos + len} > $nOut pixels")
      var i = outPos + len - 1
      var cc = c
      while (cc >= 0) {
        out(i) = suffix(cc)
        i -= 1
        cc = prefix(cc)
      }
      outPos += len
      len
    }
    var acc = 0L
    var nBits = 0
    var pos = 0
    var prev = -1
    while (outPos < nOut) {
      while (nBits < width) {
        require(pos < data.length, "truncated LZW stream")
        acc |= (data(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      if (code == clear) { reset(); prev = -1 }
      else if (code == eoi) {
        require(outPos == nOut,
          s"early EOI: $outPos of $nOut pixels decoded")
      } else {
        rc += 1
        if (prev == -1) {
          require(code < clear, s"first code $code is not a literal")
          expand(code)
          prev = code
        } else {
          require(code < next || (code == next && next < 4096),
            s"LZW code $code out of range (next=$next)")
          if (next < 4096) {
            // New entry = prev + first byte of current; for the KwKwK
            // case (code == next) that entry IS the current code, so
            // register it before expanding.
            prefix(next) = prev
            length(next) = length(prev) + 1
            val cur = if (code == next) next else code
            // suffix = first byte of cur: walk to the root.
            var cc = cur
            while (prefix(cc) >= 0) cc = prefix(cc)
            suffix(next) = suffix(cc)
            next += 1
            expand(cur)
            prev = cur
          } else {
            expand(code)
            prev = code
          }
        }
        if (rc > (1 << width) && width < 12) width += 1
      }
    }
    require(outPos == nOut, s"decoded $outPos of $nOut pixels")
    out
  }
}
