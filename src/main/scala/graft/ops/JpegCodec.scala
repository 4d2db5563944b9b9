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

  // ITU-T81 Annex K luminance quantization table (natural order)
  private val annexKLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

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

  /** ENCODE a grayscale image as baseline JPEG (the write half of the
    * codec): Annex-K luminance quantization scaled by the libjpeg
    * quality convention, exact float FDCT, zigzag + DC-differential +
    * run-length AC entropy coding. Huffman tables are FIXED-WIDTH
    * canonical (every DC symbol 4 bits, every AC symbol 8 bits) —
    * valid prefix-free tables any decoder accepts, chosen for
    * verifiable simplicity over compression ratio (documented trade:
    * ~1.5-2× larger files than optimized tables; the DECODER handles
    * arbitrary tables, so it round-trips both our output and
    * libjpeg-style streams). Output is pure function of
    * (samples, quality) — byte-deterministic across JVMs.
    */
  def encodeGray(width: Int, height: Int, samples: Array[Int],
      quality: Int = 85, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && samples.length == width * height,
      "bad encode dimensions")
    require(quality >= 1 && quality <= 100, s"quality $quality")
    require(restartInterval >= 0, s"restartInterval $restartInterval")
    // libjpeg quality scaling of the Annex K table
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    val q = annexKLum.map(v =>
      math.max(1, math.min(255, (v * scale + 50) / 100)))
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8) // SOI
    marker(0xdb); w16(2 + 1 + 64); w8(0x00) // DQT, 8-bit table 0
    var i = 0
    while (i < 64) { w8(q(zigzag(i))); i += 1 } // zigzag order
    marker(0xc0); w16(8 + 3); w8(8); w16(height); w16(width) // SOF0
    w8(1); w8(1); w8(0x11); w8(0) // 1 comp, 1x1, q-table 0
    // fixed-width canonical Huffman: 12 DC symbols at 4 bits (codes
    // 0..11; all-ones 15 unused), 162 AC symbols at 8 bits (codes
    // 0..161; all-ones 255 unused)
    val acSyms = (for (r <- 0 to 15; sz <- 0 to 10
      if (sz > 0) || r == 0 || r == 15) yield (r << 4) | sz).toArray
    require(acSyms.length == 162, s"ac table ${acSyms.length}")
    marker(0xc4)
    w16(2 + (1 + 16 + 12) + (1 + 16 + acSyms.length))
    w8(0x00) // DC table 0
    (1 to 16).foreach(l => w8(if (l == 4) 12 else 0))
    (0 until 12).foreach(w8)
    w8(0x10) // AC table 0
    (1 to 16).foreach(l => w8(if (l == 8) acSyms.length else 0))
    acSyms.foreach(w8)
    if (restartInterval > 0) { marker(0xdd); w16(4); w16(restartInterval) }
    marker(0xda); w16(6 + 2); w8(1); w8(1); w8(0x00) // SOS
    w8(0); w8(63); w8(0)
    val acCode = acSyms.zipWithIndex.toMap
    // bit writer with 0xFF stuffing
    var cur = 0; var cnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1)
        cnt += 1
        if (cnt == 8) {
          w8(cur)
          if ((cur & 0xff) == 0xff) w8(0x00)
          cur = 0; cnt = 0
        }
        k -= 1
      }
    }
    def category(v: Int): Int = {
      var a = math.abs(v); var t = 0
      while (a > 0) { a >>= 1; t += 1 }
      t
    }
    def putCoeff(v: Int, t: Int): Unit =
      if (t > 0) putBits(if (v < 0) v + (1 << t) - 1 else v, t)
    // byte-align (pad with 1s) — used before restart markers and EOI
    def flushBits(): Unit = if (cnt > 0) {
      cur = (cur << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      w8(cur)
      if ((cur & 0xff) == 0xff) w8(0x00)
      cur = 0; cnt = 0
    }
    val mcusX = (width + 7) / 8; val mcusY = (height + 7) / 8
    val coefZ = new Array[Int](64)
    var pred = 0
    var mcuIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 &&
            mcuIdx % restartInterval == 0) {
          flushBits()
          marker(0xd0 + ((mcuIdx / restartInterval - 1) % 8))
          pred = 0
        }
        mcuIdx += 1
        // FDCT of the (edge-replicated) 8×8 block
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var acc = 0.0
            var y = 0
            while (y < 8) {
              val sy = math.min(height - 1, my * 8 + y)
              var x = 0
              while (x < 8) {
                val sx = math.min(width - 1, mx * 8 + x)
                acc += (samples(sy * width + sx) - 128) *
                  idctCos(x)(u) * idctCos(y)(v)
                x += 1
              }
              y += 1
            }
            val nat = v * 8 + u
            coefZ(nat) = math.rint(acc / 4.0 / q(nat)).toInt
            u += 1
          }
          v += 1
        }
        // entropy-code: DC diff then run-length AC, zigzag order
        val dc = coefZ(0)
        val diff = dc - pred
        pred = dc
        val t = category(diff)
        putBits(t, 4) // fixed-width DC code == symbol index
        putCoeff(diff, t)
        var run = 0
        var k = 1
        while (k < 64) {
          val c = coefZ(zigzag(k))
          if (c == 0) run += 1
          else {
            while (run > 15) { putBits(acCode(0xf0), 8); run -= 16 }
            val sz = category(c)
            putBits(acCode((run << 4) | sz), 8)
            putCoeff(c, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) putBits(acCode(0x00), 8) // EOB
        mx += 1
      }
      my += 1
    }
    flushBits()
    marker(0xd9) // EOI
    out.toByteArray
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
        case 0xcc => // DAC: arithmetic coding even under a baseline SOF0
          throw new IllegalArgumentException(
            "arithmetic-coded JPEG (DAC marker) not supported — " +
              "Huffman baseline only")
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
            require(dcT(c.td) != null && acT(c.ta) != null,
              s"scan component $id references Huffman tables " +
                s"(dc=${c.td}, ac=${c.ta}) that were never defined — " +
                "corrupt or non-Huffman stream")
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
