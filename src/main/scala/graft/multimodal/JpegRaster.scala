package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M16: TRUE baseline JPEG decode — the dominant photographic format,
  * decoded end to end with no codec library: marker walk (DQT/DHT/
  * SOF0/DRI/SOS), canonical Huffman entropy decode with byte
  * de-stuffing and restart markers, differential-DC + run-length-AC
  * coefficient recovery in zigzag order, dequantization, the full 2-D
  * inverse DCT, level shift, and (for color) JFIF YCbCr→RGB — all
  * inside one whole-stage-codegen expression emitting the M10
  * pixel-statistics contract.
  *
  * Determinism: the IDCT uses StrictMath cosines and double
  * arithmetic, so results are bit-identical on every JVM. (The JPEG
  * standard itself only bounds decoder IDCT error — cross-DECODER
  * agreement is inherently approximate, which is why the spec checks
  * the JDK's own decoder within ±1/pixel while the gate fixture is
  * DC-only with q₀ = 8, where every conforming IDCT is exact and the
  * oracle is closed-form.)
  *
  * Subset honored (reject-by-null, never misread): baseline
  * sequential SOF0, 8-bit precision, 1 or 3 components; color
  * sampling 4:4:4 (1×1,1×1,1×1), 4:2:2 (2×1), 4:4:0 (1×2), and the
  * dominant photographic regime 4:2:0 (2×2) — luma factors up to
  * 2×2 with 1×1 chroma, upsampled NEAREST/box (each chroma sample
  * covers its h₀×v₀ pixel cell; the choice of upsampling filter is
  * outside ISO 10918's conformance bound, which constrains only the
  * IDCT — stated contract, spec'd against the JDK decoder with a
  * chroma-constant fixture where every conforming upsampler is
  * exact). Grayscale scans are non-interleaved, so declared sampling
  * factors are ignored per spec (MCU = one data unit). 8-bit
  * quantization tables, interleaved single scan. Restart intervals
  * handled; progressive/arithmetic/hierarchical rejected.
  */
object JpegRaster {

  val schema: StructType = StructType(
    Seq(StructField("channels", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)) ++
      (0 until 8).map(i => StructField(s"h$i", LongType, nullable = false)))

  /** Column form: the per-image statistics struct, null for payloads
    * outside the stated subset.
    */
  def jpeg_stats(payload: Column): Column =
    ColumnBridge.column(JpegStatsExpr(ColumnBridge.expression(payload)))

  /** Zigzag scan order: zz(k) = raster index of the k-th coefficient. */
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var k = 0
    for (s <- 0 until 15) {
      val xs = math.max(0, s - 7) to math.min(7, s)
      val diag = if (s % 2 == 0) xs.reverse else xs
      for (x <- diag) { z(k) = (s - x) * 8 + x; k += 1 }
    }
    z
  }

  // IDCT basis: c(u) * cos((2x+1) u pi / 16), StrictMath for JVM-stable bits
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }

  private final class SubsetReject extends RuntimeException

  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    // canonical table: mincode/maxcode/valptr per length (JPEG F.2.2.3)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) == 0) -1 else code - 1
        code <<= 1
      }
    }
    def value(l: Int, code: Int): Int =
      vals(valPtr(l) + code - minCode(l)) & 0xff
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def byteAlign(): Unit = { acc = 0; nBits = 0 }
    /** Next marker byte pair at the current byte position (after align). */
    def peekMarker(): Int =
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) != 0) ((0xff << 8) | (b(pos + 1) & 0xff))
      else -1
    def skipMarker(): Unit = { pos += 2 }
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) throw new SubsetReject
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw new SubsetReject
          val n = b(pos) & 0xff
          if (n == 0) pos += 1 // stuffed byte
          else throw new SubsetReject // marker inside entropy data
        }
        acc = v; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit(); var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) return h.value(l, code)
        code = (code << 1) | bit(); l += 1
      }
      throw new SubsetReject
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Decode + accumulate in one pass; null outside the subset. */
  def parse(b: Array[Byte]): InternalRow =
    try decodeOrReject(b)
    catch {
      case _: SubsetReject => null
      case _: ArrayIndexOutOfBoundsException => null
    }

  private def decodeOrReject(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var w = 0; var h = 0; var nc = 0
    var progressive = false
    var sofSeen = false
    var anyScan = false
    val compQ = new Array[Int](3)
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    val compIds = new Array[Int](3)
    var restartInterval = 0
    // full-frame coefficient planes (natural order within each block),
    // allocated at SOF over the PADDED (MCU-aligned) block grid — the
    // grid interleaved scans code; non-interleaved scans walk the
    // component's own (unpadded) grid and map into it
    var coefs: Array[Array[Int]] = null
    val pbw = new Array[Int](3); val pbh = new Array[Int](3) // padded grid
    val cbw = new Array[Int](3); val cbh = new Array[Int](3) // component grid
    var h0 = 1; var v0 = 1
    var mcusX = 0; var mcusY = 0

    /** One scan's entropy-coded data: decodes into `coefs`, returns the
      * byte position after the scan (aligned, at the next marker).
      * Handles baseline (Ss=0, Se=63, Ah=Al=0) and every progressive
      * regime: DC first/refine (interleaved or not), AC first/refine
      * (single-component), EOB runs, restart markers.
      */
    def decodeScan(scanComps: Array[Int], dcTab: Array[Int],
                   acTab: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
                   startPos: Int): Int = {
      val r = new BitReader(b, startPos)
      val pred = new Array[Int](scanComps.length)
      var eobrun = 0
      val interleaved = scanComps.length > 1
      val nUnits =
        if (interleaved) mcusX * mcusY
        else cbw(scanComps(0)) * cbh(scanComps(0))
      val p1 = 1 << al
      val m1 = -1 << al

      def dcFirst(sc: Int, c: Int, at: Int): Unit = {
        val tab = dcT(dcTab(sc))
        if (tab == null) throw new SubsetReject
        val t = r.decode(tab)
        if (t > 11) throw new SubsetReject
        pred(sc) += extend(r.bits(t), t)
        coefs(c)(at) = pred(sc) << al
      }

      def dcRefine(c: Int, at: Int): Unit =
        if (r.bit() != 0) coefs(c)(at) |= p1

      def acFirst(sc: Int, c: Int, at: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        val tab = acT(acTab(sc))
        if (tab == null) throw new SubsetReject
        var k = math.max(ss, 1)
        var done = false
        while (k <= se && !done) {
          val rs = r.decode(tab)
          val run = rs >> 4; val size = rs & 15
          if (size != 0) {
            k += run
            if (k > se) throw new SubsetReject
            coefs(c)(at + Zigzag(k)) = extend(r.bits(size), size) << al
            k += 1
          } else {
            if (run == 15) k += 16
            else {
              eobrun = 1 << run
              if (run > 0) eobrun += r.bits(run)
              eobrun -= 1 // counts THIS block
              done = true
            }
          }
        }
      }

      // G.1.2.3 AC successive-approximation refinement (the libjpeg
      // control flow: run counter walks zero-HISTORY coefficients,
      // every nonzero coefficient passed emits one correction bit)
      def acRefine(sc: Int, c: Int, at: Int): Unit = {
        val tab = acT(acTab(sc))
        if (tab == null) throw new SubsetReject
        var k = ss
        if (eobrun == 0) {
          var broke = false
          while (k <= se && !broke) {
            val rs = r.decode(tab)
            var run = rs >> 4
            val size = rs & 15
            var newval = 0
            if (size != 0) {
              if (size != 1) throw new SubsetReject
              newval = if (r.bit() != 0) p1 else m1
            } else if (run != 15) {
              eobrun = 1 << run
              if (run > 0) eobrun += r.bits(run)
              broke = true
            }
            if (!broke) {
              var placed = false
              while (k <= se && !placed) {
                val z = at + Zigzag(k)
                val cur = coefs(c)(z)
                if (cur != 0) {
                  if (r.bit() != 0 && (cur & p1) == 0)
                    coefs(c)(z) = if (cur >= 0) cur + p1 else cur + m1
                  k += 1
                } else {
                  if (run == 0) {
                    if (newval != 0) coefs(c)(z) = newval
                    placed = true
                    k += 1
                  } else { run -= 1; k += 1 }
                }
              }
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val z = at + Zigzag(k)
            val cur = coefs(c)(z)
            if (cur != 0 && r.bit() != 0 && (cur & p1) == 0)
              coefs(c)(z) = if (cur >= 0) cur + p1 else cur + m1
            k += 1
          }
          eobrun -= 1
        }
      }

      def decodeBlock(sc: Int, c: Int, at: Int): Unit = {
        if (ss == 0) {
          if (ah == 0) dcFirst(sc, c, at) else dcRefine(c, at)
        }
        if (se >= 1 && (ss >= 1 || se == 63)) {
          // progressive AC scan, or a baseline scan's AC tail
          if (ah == 0) acFirst(sc, c, at) else acRefine(sc, c, at)
        }
      }

      var unit = 0
      while (unit < nUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          r.byteAlign()
          val mk = r.peekMarker()
          if (mk < 0xffd0 || mk > 0xffd7) throw new SubsetReject
          r.skipMarker()
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }
        if (interleaved) {
          val bx = unit % mcusX; val by = unit / mcusX
          var sc = 0
          while (sc < scanComps.length) {
            val c = scanComps(sc)
            var v = 0
            while (v < compV(c)) {
              var hh = 0
              while (hh < compH(c)) {
                decodeBlock(sc, c,
                  ((by * compV(c) + v) * pbw(c) + bx * compH(c) + hh) * 64)
                hh += 1
              }
              v += 1
            }
            sc += 1
          }
        } else {
          val c = scanComps(0)
          val bx = unit % cbw(c); val by = unit / cbw(c)
          decodeBlock(0, c, (by * pbw(c) + bx) * 64)
        }
        unit += 1
      }
      r.byteAlign()
      r.pos
    }

    var i = 2
    var eoi = false
    while (!eoi) {
      if (i + 2 > b.length) return null
      if ((b(i) & 0xff) != 0xff) return null
      // B.1.1.2: a marker may be preceded by any number of 0xFF fill
      // bytes — skip the run so the code byte is the first non-0xFF
      while (i + 2 <= b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 2 > b.length) return null
      val m = b(i + 1) & 0xff
      // standalone (length-less) markers: SOI, RSTn, and TEM (0x01)
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else if (m == 0xd9) {
        if (!anyScan) return null // EOI before any scan
        eoi = true
      }
      else {
        if (i + 4 > b.length) return null
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val seg = i + 4
        m match {
          case 0xdb => // DQT
            var p = seg
            while (p < i + 2 + len) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (pq != 0 || tq > 3) return null // 16-bit tables: reject
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = b(p + 1 + k) & 0xff; k += 1 }
              qt(tq) = t
              p += 65
            }
            i += 2 + len
          case 0xc4 => // DHT (tables may be redefined between scans)
            var p = seg
            while (p < i + 2 + len) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (tc > 1 || th > 3) return null
              val bits = new Array[Int](16)
              var n = 0
              var k = 0
              while (k < 16) { bits(k) = b(p + 1 + k) & 0xff; n += bits(k); k += 1 }
              if (n > 256 || p + 17 + n > i + 2 + len) return null
              val vals = new Array[Byte](n)
              System.arraycopy(b, p + 17, vals, 0, n)
              val t = new Huff(bits, vals)
              if (tc == 0) dcT(th) = t else acT(th) = t
              p += 17 + n
            }
            i += 2 + len
          case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
            if (sofSeen) return null
            sofSeen = true
            progressive = m == 0xc2
            if ((b(seg) & 0xff) != 8) return null
            h = u16(b, seg + 1); w = u16(b, seg + 3)
            nc = b(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return null
            if (w.toLong * h > (1L << 24)) return null // 16 MP guard
            var c = 0
            while (c < nc) {
              compIds(c) = b(seg + 6 + 3 * c) & 0xff
              val hv = b(seg + 7 + 3 * c) & 0xff
              compH(c) = hv >> 4; compV(c) = hv & 0x0f
              if (compH(c) < 1 || compH(c) > 2 ||
                compV(c) < 1 || compV(c) > 2) return null
              // chroma must be 1x1 (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0)
              if (c > 0 && (compH(c) != 1 || compV(c) != 1)) return null
              compQ(c) = b(seg + 8 + 3 * c) & 0x0f
              c += 1
            }
            // grayscale scans are non-interleaved: sampling ignored (A.2)
            if (nc == 1) { compH(0) = 1; compV(0) = 1 }
            h0 = compH(0); v0 = compV(0)
            mcusX = (w + 8 * h0 - 1) / (8 * h0)
            mcusY = (h + 8 * v0 - 1) / (8 * v0)
            coefs = new Array[Array[Int]](nc)
            c = 0
            while (c < nc) {
              pbw(c) = mcusX * compH(c); pbh(c) = mcusY * compV(c)
              val cw = (w * compH(c) + h0 - 1) / h0
              val ch = (h * compV(c) + v0 - 1) / v0
              cbw(c) = (cw + 7) / 8; cbh(c) = (ch + 7) / 8
              coefs(c) = new Array[Int](pbw(c) * pbh(c) * 64)
              c += 1
            }
            i += 2 + len
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return null // extended/lossless/arithmetic/hierarchical
          case 0xdd => // DRI
            restartInterval = u16(b, seg)
            i += 2 + len
          case 0xda => // SOS: decode this scan's entropy data in place
            if (!sofSeen) return null
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > nc) return null
            if (!progressive && ns != nc) return null
            val scanComps = new Array[Int](ns)
            val dcTab = new Array[Int](ns)
            val acTab = new Array[Int](ns)
            var sc = 0
            while (sc < ns) {
              val id = b(seg + 1 + 2 * sc) & 0xff
              val tda = b(seg + 2 + 2 * sc) & 0xff
              var c = 0; var found = -1
              while (c < nc) { if (compIds(c) == id) found = c; c += 1 }
              if (found < 0) return null
              scanComps(sc) = found
              dcTab(sc) = tda >> 4; acTab(sc) = tda & 0x0f
              sc += 1
            }
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            val ah = ahal >> 4; val al = ahal & 0x0f
            if (progressive) {
              // spec G.1: DC scans are Ss=Se=0 (any components); AC
              // scans cover one component only, 1 <= Ss <= Se <= 63
              if (ss == 0 && se != 0) return null
              if (ss > 0 && (ns != 1 || ss > se || se > 63)) return null
              if (ah != 0 && ah != al + 1) return null
            } else {
              if (ss != 0 || se != 63 || ah != 0 || al != 0) return null
            }
            // quant tables must exist for the final dequantization
            var cq = 0
            while (cq < ns) {
              if (qt(compQ(scanComps(cq))) == null) return null
              cq += 1
            }
            i = decodeScan(scanComps, dcTab, acTab, ss, se, ah, al,
              i + 2 + len)
            anyScan = true
          case _ => // APPn / COM / others: skip
            i += 2 + len
        }
      }
    }

    // render: dequantize + IDCT each block, upsample chroma NEAREST,
    // accumulate the M10 statistics — one MCU at a time
    val tmp = new Array[Double](64)
    val lumaB = Array.ofDim[Int](h0 * v0, 64)
    val cbB = new Array[Int](64)
    val crB = new Array[Int](64)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)

    def idct(c: Int, at: Int, out: Array[Int]): Unit = {
      val q = qt(compQ(c))
      val plane = coefs(c)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              val f = plane(at + v * 8 + u)
              if (f != 0) s += Cos(u)(x) * Cos(v)(y) * f * q(v * 8 + u)
              v += 1
            }
            u += 1
          }
          tmp(y * 8 + x) = s / 4.0
          x += 1
        }
        y += 1
      }
      var p = 0
      while (p < 64) {
        out(p) = clamp(Math.round(tmp(p)).toInt + 128)
        p += 1
      }
    }

    val mcuW = 8 * h0; val mcuH = 8 * v0
    var mcu = 0
    val nMcu = mcusX * mcusY
    while (mcu < nMcu) {
      val bx = mcu % mcusX; val by = mcu / mcusX
      var lb = 0
      while (lb < h0 * v0) {
        idct(0, ((by * v0 + lb / h0) * pbw(0) + bx * h0 + lb % h0) * 64,
          lumaB(lb))
        lb += 1
      }
      if (nc == 3) {
        idct(1, (by * pbw(1) + bx) * 64, cbB)
        idct(2, (by * pbw(2) + bx) * 64, crB)
      }
      // chroma upsamples NEAREST: sample (xx/h0, yy/v0) covers the cell
      var yy = 0
      while (yy < mcuH) {
        val py = by * mcuH + yy
        if (py < h) {
          var xx = 0
          while (xx < mcuW) {
            val px = bx * mcuW + xx
            if (px < w) {
              val yv = lumaB((yy >> 3) * h0 + (xx >> 3))((yy & 7) * 8 + (xx & 7))
              var pr = 0; var pg = 0; var pb = 0
              if (nc == 1) { pr = yv; pg = yv; pb = yv }
              else {
                val ci = (yy / v0) * 8 + (xx / h0)
                val cb = cbB(ci) - 128
                val cr = crB(ci) - 128
                pr = clamp(Math.round(yv + 1.402 * cr).toInt)
                pg = clamp(Math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt)
                pb = clamp(Math.round(yv + 1.772 * cb).toInt)
              }
              sumR += pr; sumG += pg; sumB += pb
              val luma = 299 * pr + 587 * pg + 114 * pb
              var bucket = luma / 31875
              if (bucket > 7) bucket = 7
              hist(bucket) += 1L
            }
            xx += 1
          }
        }
        yy += 1
      }
      mcu += 1
    }
    new GenericInternalRow(Array[Any](nc, w, h, w.toLong * h,
      sumR, sumG, sumB) ++ hist.map(v => v: Any))
  }
}

/** Expression wrapper: the [[JpegRaster.schema]] struct from a binary
  * column; null outside the stated subset. Eval and codegen share
  * [[JpegRaster.parse]].
  */
case class JpegStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = JpegRaster.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"jpeg_stats needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    JpegRaster.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.JpegRaster.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
