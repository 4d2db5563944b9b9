package graft.ops

/** Baseline JPEG (ITU-T81 sequential DCT, SOF0) DECODER — the fifth
  * real media codec and the first LOSSY one (PNG/BMP/GIF/WAV are all
  * exact): full marker parse (DQT/SOF0/DHT/DRI/SOS), canonical Huffman
  * entropy decode with 0xFF00 byte-stuffing and RSTn restart handling,
  * DC prediction + EXTEND, run-length AC with ZRL/EOB, dequantization,
  * inverse zigzag, exact float 2-D IDCT, level shift, chroma
  * upsampling (4:4:4 / 4:2:2 / 4:2:0 nearest), JFIF YCbCr→RGB.
  *
  * Supports what the JDK's own writer emits (baseline, 8-bit, 1- or
  * 3-component, Huffman tables in any DHT layout, optional restart
  * markers); progressive (SOF2) and arithmetic coding fail loudly.
  * Because JPEG is lossy there is no bit-exact ground truth — the
  * conformance contract (JpegCodecSpec, mm11) is per-sample agreement
  * with ImageIO's independent decoder on the SAME bytes within a small
  * measured bound (different IDCT implementations round differently by
  * ±1-2 per sample).
  *
  * Scale: decode is scan-local executor work over binary columns (the
  * mm-family discipline) — one call per blob inside mapPartitions,
  * no shuffle participation.
  */
object JpegCodec {

  final case class Image(width: Int, height: Int, rgb: Array[Int])

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1) u π / 16) scaled by C(u); exact doubles, computed once
  private val idctCos: Array[Array[Double]] = Array.tabulate(8, 8) {
    (x, u) =>
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code tables: minCode/maxCode/valPtr per bit-length
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        code = (code << 1) | br.bit()
        l += 1
      }
      throw new IllegalArgumentException("invalid JPEG Huffman code")
    }
  }

  /** Entropy-coded-segment bit reader: strips 0xFF00 stuffing, stops at
    * any marker (restart or EOI) and reports it for the MCU loop. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    var markerSeen: Int = -1 // 0xD0..0xD7 restart, 0xD9 EOI, etc.

    def bit(): Int = {
      if (cnt == 0) {
        if (markerSeen >= 0 || pos >= bytes.length) return 0 // pad
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val nxt = if (pos < bytes.length) bytes(pos) & 0xff else 0xd9
          if (nxt == 0x00) { pos += 1 } // stuffed data byte 0xFF
          else { markerSeen = nxt; pos += 1; b = 0; return 0 }
        }
        cur = b; cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      cnt = 0
      if (markerSeen < 0) {
        // scan forward to the marker (spec says it is byte-aligned next)
        while (pos + 1 < bytes.length &&
          !((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xff) >= 0xd0
            && (bytes(pos + 1) & 0xff) <= 0xd7)) pos += 1
        require(pos + 1 < bytes.length, "expected JPEG restart marker")
        markerSeen = bytes(pos + 1) & 0xff
        pos += 2
      }
      require(markerSeen >= 0xd0 && markerSeen <= 0xd7,
        f"expected RSTn, saw marker 0x$markerSeen%02x")
      markerSeen = -1
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0
    var ta = 0
    var pred = 0
  }

  /** Decode baseline JPEG bytes to packed 0xRRGGBB pixels. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    var pos = 2
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) |
      (bytes(pos + 1) & 0xff); pos += 2; v }

    val qt = Array.ofDim[Int](4, 64)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var sosSeen = false

    while (!sosSeen) {
      require(pos + 1 < bytes.length, "truncated JPEG before SOS")
      require(u8() == 0xff, "JPEG marker desync")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xc0 => // SOF0 baseline
          val len = u16(); val end = pos + len - 2
          val prec = u8()
          require(prec == 8, s"unsupported JPEG precision $prec")
          height = u16(); width = u16()
          val nc = u8()
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          comps = Array.fill(nc) {
            val id = u8(); val hv = u8(); val tq = u8()
            Comp(id, hv >> 4, hv & 15, tq)
          }
          pos = end
        case 0xc2 =>
          throw new IllegalArgumentException(
            "progressive JPEG (SOF2) not supported — baseline only")
        case sof if sof >= 0xc1 && sof <= 0xcf && sof != 0xc4 &&
            sof != 0xc8 && sof != 0xcc =>
          throw new IllegalArgumentException(
            f"unsupported JPEG SOF marker 0x$sof%02x — baseline only")
        case 0xc4 => // DHT (possibly several tables)
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val tcTh = u8()
            val counts = Array.fill(16)(u8())
            val n = counts.sum
            val syms = Array.fill(n)(u8())
            val t = new Huff(counts, syms)
            if ((tcTh >> 4) == 0) dcT(tcTh & 15) = t else acT(tcTh & 15) = t
          }
        case 0xdb => // DQT (possibly several tables)
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val pqTq = u8()
            val tq = pqTq & 15
            val wide = (pqTq >> 4) == 1
            var i = 0
            while (i < 64) {
              qt(tq)(i) = if (wide) u16() else u8(); i += 1
            }
          }
        case 0xdd => // DRI
          u16(); restartInterval = u16()
        case 0xda => // SOS
          u16()
          val ns = u8()
          require(comps != null && ns == comps.length,
            "SOS/SOF component mismatch")
          var i = 0
          while (i < ns) {
            val id = u8(); val tdta = u8()
            val c = comps.find(_.id == id).getOrElse(
              throw new IllegalArgumentException(s"unknown scan comp $id"))
            c.td = tdta >> 4; c.ta = tdta & 15
            i += 1
          }
          pos += 3 // Ss, Se, Ah/Al — fixed for baseline
          sosSeen = true
        case 0xd9 =>
          throw new IllegalArgumentException("EOI before SOS — no image")
        case _ => // APPn, COM, anything else with a length: skip
          val len = u16()
          pos += len - 2
      }
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component sample planes at the component's own resolution
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i =>
      new Array[Int](planeW(i) * planeH(i))).toArray

    val br = new BitReader(bytes, pos)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // ---- entropy-decode one 8×8 block ----
            java.util.Arrays.fill(coef, 0)
            val t = dcT(c.td).decode(br)
            c.pred += extend(br.receive(t), t)
            coef(0) = c.pred * q(0)
            var k = 1
            var done = false
            while (k < 64 && !done) {
              val rs = acT(c.ta).decode(br)
              val r = rs >> 4; val sz = rs & 15
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else done = true // EOB
              } else {
                k += r
                require(k < 64, "JPEG AC run past block end")
                coef(zigzag(k)) = extend(br.receive(sz), sz) * q(k)
                k += 1
              }
            }
            // ---- exact float 2-D IDCT + level shift ----
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0
                var v = 0
                while (v < 8) {
                  var u = 0
                  val cv = idctCos(y)(v)
                  while (u < 8) {
                    val f = coef(v * 8 + u)
                    if (f != 0) acc += idctCos(x)(u) * cv * f
                    u += 1
                  }
                  v += 1
                }
                block(y * 8 + x) = acc / 4.0 + 128.0
                x += 1
              }
              y += 1
            }
            // ---- place into the component plane ----
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            val pw = planeW(ci)
            y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val s = math.max(0.0, math.min(255.0,
                  math.rint(block(y * 8 + x)))).toInt
                planes(ci)((py0 + y) * pw + (px0 + x)) = s
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // ---- upsample + color convert ----
    val rgb = new Array[Int](width * height)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = planes(0)(y * pw + x)
          rgb(y * width + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      def sample(ci: Int, x: Int, y: Int): Int = {
        val c = comps(ci)
        val sx = x * c.h / hmax
        val sy = y * c.v / vmax
        planes(ci)(sy * planeW(ci) + sx)
      }
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = sample(0, x, y).toDouble
          val cb = sample(1, x, y) - 128.0
          val cr = sample(2, x, y) - 128.0
          def clamp(d: Double): Int =
            math.max(0.0, math.min(255.0, math.rint(d))).toInt
          val r = clamp(yy + 1.402 * cr)
          val g = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          val b = clamp(yy + 1.772 * cb)
          rgb(y * width + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
    }
    Image(width, height, rgb)
  }
}
