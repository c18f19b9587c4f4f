package graft.operators

/** Baseline-sequential JPEG decode to a grayscale grid (ITU T.81:
  * SOI/DQT/DHT/SOF0/SOS marker parse, byte-stuffed entropy stream with
  * restart markers, per-MCU Huffman DC/AC decode, dequantize, zigzag,
  * integer AAN-free reference IDCT, level shift). Only the Y (luma)
  * plane is materialized — grayscale IS the luma channel — but chroma
  * coefficients are still entropy-decoded to advance the bit stream.
  *
  * Progressive (SOF2), arithmetic-coded, 12-bit and hierarchical JPEGs
  * return None, as does anything corrupt or truncated — corrupt items
  * are data, not errors. JPEG decoders may legally differ by ±1 per
  * sample (the spec bounds IDCT accuracy, not bit-exactness), so
  * differential tests gate on tolerance, not equality.
  */
object JpegDecode {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table: code lengths histogram + symbol list →
    * (maxcode/valptr arrays for the serial decode of T.81 F.2.2.3). */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = code - 1
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def symbol(idx: Int): Int = symbols(idx)
  }

  /** Bit reader over the entropy-coded segment with 0xFF00 unstuffing;
    * stops at any marker (0xFF xx, xx != 0). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bits = 0L // Long: up to 32 live bits plus an 8-bit refill
    private var nBits = 0
    var hitMarker = false
    def fill(): Boolean = {
      while (nBits <= 24) {
        if (pos >= b.length) return nBits > 0
        val v = u8(b, pos)
        if (v == 0xff) {
          if (pos + 1 >= b.length) { hitMarker = true; return nBits > 0 }
          val nxt = u8(b, pos + 1)
          if (nxt == 0) { pos += 2; bits = (bits << 8) | 0xff; nBits += 8 }
          else { hitMarker = true; return nBits > 0 } // restart or section end
        } else { pos += 1; bits = (bits << 8) | v; nBits += 8 }
      }
      true
    }
    def bit(): Int = {
      if (nBits == 0 && !fill()) return -1
      if (nBits == 0) return -1
      nBits -= 1
      ((bits >> nBits) & 1L).toInt
    }
    def receive(n: Int): Int = {
      var v = 0; var k = 0
      while (k < n) {
        val x = bit(); if (x < 0) return Int.MinValue
        v = (v << 1) | x; k += 1
      }
      v
    }
    /** Skip to the next marker boundary and consume an RSTn. True if an
      * RSTn was consumed. */
    def restart(): Boolean = {
      bits = 0; nBits = 0; hitMarker = false
      while (pos + 1 < b.length) {
        if (u8(b, pos) == 0xff) {
          val m = u8(b, pos + 1)
          if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
          if (m != 0) return false
          pos += 2
        } else pos += 1
      }
      false
    }
    def decodeHuff(h: Huff): Int = {
      var code = bit(); if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.symbol(h.valPtr(l) + code - h.minCode(l))
        val x = bit(); if (x < 0) return -1
        code = (code << 1) | x
        l += 1
      }
      -1
    }
  }

  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  /** Reference float IDCT (separable, double precision) + level shift +
    * clamp. Accuracy-first: this is the correctness anchor the tests
    * tolerance-gate against other decoders. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752440 else 1.0
          s += cv * coef(v * 8 + u) * math.cos((2 * x + 1) * v * math.Pi / 16)
          v += 1
        }
        tmp(x * 8 + u) = s
        x += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u2 = 0
        while (u2 < 8) {
          val cu = if (u2 == 0) 0.70710678118654752440 else 1.0
          s += cu * tmp(y * 8 + u2) * math.cos((2 * x + 1) * u2 * math.Pi / 16)
          u2 += 1
        }
        val v = math.round(s / 4.0 + 128.0).toInt
        out(y * 8 + x) = if (v < 0) 0 else if (v > 255) 255 else v
        x += 1
      }
      y += 1
    }
  }

  private final case class Component(id: Int, hs: Int, vs: Int, tq: Int) {
    var dcTab: Huff = null
    var acTab: Huff = null
    var dcPred: Int = 0
  }

  /** Decode to (width, height, luma grid) or None. */
  def decodeGray(b: Array[Byte]): Option[ImageDedup.GrayImage] = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    val quant = Array.ofDim[Int](4, 64)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var i = 2
    try {
      while (i + 4 <= b.length) {
        if (u8(b, i) != 0xff) return None
        val marker = u8(b, i + 1)
        if (marker == 0xd8) { i += 2 }
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 }
        else {
          val len = be16(b, i + 2)
          if (len < 2 || i + 2 + len > b.length) return None
          val seg = i + 4
          marker match {
            case 0xdb => // DQT
              var p = seg
              while (p < i + 2 + len) {
                val pq = u8(b, p) >> 4; val tq = u8(b, p) & 15
                if (tq > 3) return None
                if (pq == 0) {
                  if (p + 65 > i + 2 + len) return None
                  var k = 0
                  while (k < 64) { quant(tq)(k) = u8(b, p + 1 + k); k += 1 }
                  p += 65
                } else {
                  if (p + 129 > i + 2 + len) return None
                  var k = 0
                  while (k < 64) { quant(tq)(k) = be16(b, p + 1 + 2 * k); k += 1 }
                  p += 129
                }
              }
            case 0xc4 => // DHT
              var p = seg
              while (p + 17 <= i + 2 + len) {
                val tc = u8(b, p) >> 4; val th = u8(b, p) & 15
                if (tc > 1 || th > 3) return None
                val counts = Array.tabulate(16)(k => u8(b, p + 1 + k))
                val total = counts.sum
                if (total > 256 || p + 17 + total > i + 2 + len) return None
                val syms = Array.tabulate(total)(k => u8(b, p + 17 + k))
                val tab = new Huff(counts, syms)
                if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
                p += 17 + total
              }
            case 0xc0 | 0xc1 => // SOF0/1: baseline (extended) sequential
              if (len < 8) return None
              val prec = u8(b, seg)
              h = be16(b, seg + 1); w = be16(b, seg + 3)
              val nc = u8(b, seg + 5)
              if (prec != 8 || w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
              if (nc != 1 && nc != 3) return None
              if (len < 8 + nc * 3) return None
              comps = Array.tabulate(nc) { c =>
                val o = seg + 6 + c * 3
                val cid = u8(b, o); val hv = u8(b, o + 1); val tq = u8(b, o + 2)
                val comp = Component(cid, hv >> 4, hv & 15, tq)
                if (comp.hs < 1 || comp.hs > 4 || comp.vs < 1 || comp.vs > 4 || tq > 3)
                  return None
                comp
              }
            case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                0xcd | 0xce | 0xcf =>
              return None // progressive/arithmetic/hierarchical: unsupported
            case 0xdd => // DRI
              if (len < 4) return None
              restartInterval = be16(b, seg)
            case 0xda => // SOS: entropy-coded data follows
              if (comps == null) return None
              val ns = u8(b, seg)
              if (ns != comps.length || len < 6 + 2 * ns) return None
              var p = seg + 1
              var c = 0
              while (c < ns) {
                val cs = u8(b, p); val tabs = u8(b, p + 1)
                val comp = comps.find(_.id == cs).getOrElse(return None)
                comp.dcTab = dcTabs(tabs >> 4)
                comp.acTab = acTabs(tabs & 15)
                if (comp.dcTab == null || comp.acTab == null) return None
                p += 2
                c += 1
              }
              return decodeScan(b, i + 2 + len, w, h, comps, quant, restartInterval)
            case 0xd9 => return None // EOI before SOS
            case _    => // APPn/COM/etc: skip
          }
          i += 2 + len
        }
      }
      None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      restartInterval: Int): Option[ImageDedup.GrayImage] = {
    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val y0 = comps(0) // luma
    val lumaW = mcusX * y0.hs * 8
    val lumaH = mcusY * y0.vs * 8
    if (lumaW.toLong * lumaH > (1L << 28)) return None
    val luma = new Array[Int](lumaW * lumaH)
    val r = new BitReader(b, start)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart()) return None
        comps.foreach(_.dcPred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < comps.length) {
        val comp = comps(c)
        val q = quant(comp.tq)
        var by = 0
        while (by < comp.vs) {
          var bx = 0
          while (bx < comp.hs) {
            // Huffman-decode one 8x8 block
            java.util.Arrays.fill(coef, 0)
            val t = r.decodeHuff(comp.dcTab)
            if (t < 0) return None
            val diff = if (t == 0) 0 else {
              val v = r.receive(t); if (v == Int.MinValue) return None
              extend(v, t)
            }
            comp.dcPred += diff
            coef(0) = comp.dcPred * q(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = r.decodeHuff(comp.acTab)
              if (rs < 0) return None
              val rrrr = rs >> 4; val ssss = rs & 15
              if (ssss == 0) {
                if (rrrr == 15) k += 16 // ZRL
                else open = false       // EOB
              } else {
                k += rrrr
                if (k > 63) return None
                val v = r.receive(ssss); if (v == Int.MinValue) return None
                coef(zigzag(k)) = extend(v, ssss) * q(k)
                k += 1
              }
            }
            if (c == 0) { // only the luma plane is materialized
              idct(coef, px)
              val ox = (mx * comp.hs + bx) * 8
              val oy = (my * comp.vs + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  luma((oy + yy) * lumaW + ox + xx) = px(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    // crop the padded luma plane to the image size; if luma was
    // subsampled relative to hMax/vMax (rare), scale indices
    val sx = hMax / y0.hs
    val sy = vMax / y0.vs
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        gray(y * w + x) = luma((y / sy) * lumaW + (x / sx))
        x += 1
      }
      y += 1
    }
    Some(ImageDedup.GrayImage(w, h, gray))
  }
}
