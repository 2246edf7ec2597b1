package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M17: TIFF raster decode — the scanning/scientific archive format
  * (and the one whose lossless forms make an external-encoder
  * round-trip EXACT, not tolerance-bounded). Implements the real
  * structure: both byte orders (`II` and `MM`), the IFD entry walk
  * with SHORT/LONG value types and the inline-vs-offset value rule,
  * BitsPerSample arrays, and multi-strip assembly — then the M10
  * pixel-statistics walk over the strips, all inside whole-stage
  * codegen.
  *
  * Compression arms (r9 — the archive-scan regimes): 1 (none),
  * 32773 (PackBits RLE), 5 (TIFF LZW — MSB-first codes with the
  * spec's early code-width change at 2^w−1), and 8/32946 (zlib
  * Deflate via the JDK Inflater). Every strip decompresses to its
  * EXACT expected byte count — short or overlong streams reject, so
  * a decompression bomb can never allocate past the declared raster
  * (bomb guard, the PNG posture). Predictor 2 (horizontal
  * differencing) honored after decompression. Photometric 3
  * (palette) honored with the ColorMap tag's 16-bit entries scaled
  * ≫8 to 8-bit RGB.
  *
  * Organization (r10): BOTH strip-organized (tags 273/278/279) and
  * TILED rasters (tags 322/323/324/325 — the GIS/microscopy archive
  * layout): tiles decode through the same compression arms to the
  * full padded tile size, the predictor undoes per tile row, and
  * right/bottom edge padding never reaches the statistics.
  *
  * Planar configurations (r10b): chunky (1, RGBRGB…) AND separate
  * planes (2) — under PlanarConfiguration=2 each strip/tile carries
  * ONE channel's samples and the regions order plane-major (all R
  * bands/tiles, then G, then B, the spec's rule); compression and the
  * predictor apply per plane (stride 1), and the three same-geometry
  * planes of a band/tile accumulate together.
  *
  * Subset honored (reject-by-null, never misread): single-IFD,
  * 8 bits per sample on every channel, SamplesPerPixel 1
  * (BlackIsZero/WhiteIsZero gray or palette) or 3 (RGB), tile dims
  * multiples of 16 (the spec's rule), strip/tile regions fully inside
  * the payload. Gray contributes equally to all three channel sums
  * (the M15 contract).
  */
object TiffRaster {

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
  def tiff_stats(payload: Column): Column =
    ColumnBridge.column(TiffStatsExpr(ColumnBridge.expression(payload)))

  /** Decode + accumulate in one pass; null outside the subset. */
  def parse(b: Array[Byte]): InternalRow =
    try decodeOrReject(b)
    catch { case _: ArrayIndexOutOfBoundsException => null }

  private def decodeOrReject(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 8) return null
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return null
    def u16(i: Int): Int =
      if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(2) != 42) return null
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = u16(ifd.toInt)
    val base = ifd.toInt + 2
    if (base + 12 * n + 4 > b.length) return null
    // single-IFD contract: a non-zero next-IFD pointer means a
    // multi-page file — reject rather than silently decode page one
    if (u32(base + 12 * n) != 0L) return null

    // one IFD entry's value list as longs (SHORT=3 or LONG=4 only)
    def values(entry: Int): Array[Long] = {
      val typ = u16(entry + 2)
      val cnt = u32(entry + 4)
      if (cnt <= 0 || cnt > (1 << 20)) return null
      val width = typ match {
        case 3 => 2
        case 4 => 4
        case _ => return null
      }
      val total = width * cnt
      val at =
        if (total <= 4) entry + 8
        else {
          val off = u32(entry + 8)
          if (off < 0 || off + total > b.length) return null
          off.toInt
        }
      Array.tabulate(cnt.toInt)(k =>
        if (width == 2) u16(at + 2 * k).toLong else u32(at + 4 * k))
    }

    var w = 0L; var h = 0L; var spp = 1L; var rps = Long.MaxValue
    var compression = 1L; var photometric = -1L; var planar = 1L
    var predictor = 1L
    var bits: Array[Long] = Array(1L) // TIFF default: 1 bit
    var offsets: Array[Long] = null
    var counts: Array[Long] = null
    var cmap: Array[Long] = null
    var tileW = 0L; var tileL = 0L
    var tileOffsets: Array[Long] = null
    var tileCounts: Array[Long] = null
    var e = 0
    while (e < n) {
      val entry = base + 12 * e
      val tag = u16(entry)
      tag match {
        case 256 => val v = values(entry); if (v == null) return null; w = v(0)
        case 257 => val v = values(entry); if (v == null) return null; h = v(0)
        case 258 => val v = values(entry); if (v == null) return null; bits = v
        case 259 => val v = values(entry); if (v == null) return null; compression = v(0)
        case 262 => val v = values(entry); if (v == null) return null; photometric = v(0)
        case 273 => offsets = values(entry); if (offsets == null) return null
        case 277 => val v = values(entry); if (v == null) return null; spp = v(0)
        case 278 => val v = values(entry); if (v == null) return null; rps = v(0)
        case 279 => counts = values(entry); if (counts == null) return null
        case 284 => val v = values(entry); if (v == null) return null; planar = v(0)
        case 317 => val v = values(entry); if (v == null) return null; predictor = v(0)
        case 320 => cmap = values(entry); if (cmap == null) return null
        // tiled organization (r10 — GIS/microscopy archives)
        case 322 => val v = values(entry); if (v == null) return null; tileW = v(0)
        case 323 => val v = values(entry); if (v == null) return null; tileL = v(0)
        case 324 => tileOffsets = values(entry); if (tileOffsets == null) return null
        case 325 => tileCounts = values(entry); if (tileCounts == null) return null
        case _ => // ignore (resolution, software, ...)
      }
      e += 1
    }
    if (w <= 0 || h <= 0 || w > Int.MaxValue / 4 || h > Int.MaxValue) return null
    // PlanarConfiguration 2 (r10b): each strip/tile carries ONE
    // channel's samples, plane-major (all R regions, then G, then B —
    // the spec's ordering). With spp=1 the single plane IS the chunky
    // raster, so only RGB takes the separate-plane path.
    if (planar != 1 && planar != 2) return null
    val planarSep = planar == 2 && spp == 3
    if (compression != 1 && compression != 5 && compression != 8 &&
      compression != 32773 && compression != 32946) return null
    if (predictor != 1 && predictor != 2) return null
    if (spp != 1 && spp != 3) return null
    if (spp == 1 && photometric != 1 && photometric != 0 &&
      photometric != 3) return null
    if (spp == 3 && photometric != 2) return null
    if (photometric == 3 && (spp != 1 || cmap == null ||
      cmap.length != 3 * 256)) return null
    if (bits.length != spp || bits.exists(_ != 8L)) return null
    val tiled = tileOffsets != null || tileCounts != null ||
      tileW > 0 || tileL > 0
    if (tiled) {
      // tiled organization is exclusive with strips (spec); all four
      // tile tags must be present and consistent
      if (offsets != null || counts != null) return null
      if (tileOffsets == null || tileCounts == null ||
        tileOffsets.length != tileCounts.length) return null
      if (tileW <= 0 || tileL <= 0) return null
      // spec: tile dims are multiples of 16 — reject, never misread
      if (tileW % 16 != 0 || tileL % 16 != 0) return null
    } else {
      if (offsets == null || counts == null ||
        offsets.length != counts.length) return null
      if (rps <= 0) return null
      // tag 278 default is "all rows in one strip" (spec: 2^32-1); clamp
      // to h so the ceiling division below can't overflow Long.MaxValue
      if (rps > h) rps = h
    }

    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)

    // decompress (or slice) one region to EXACTLY `need` bytes
    def decodeRegion(off: Long, cnt: Long, need: Int): Array[Byte] = {
      if (off < 0 || cnt < 0 || off + cnt > b.length) return null
      compression match {
        case 1 =>
          if (cnt < need) return null
          val out = new Array[Byte](need)
          System.arraycopy(b, off.toInt, out, 0, need)
          out
        case 32773 => unpackBits(b, off.toInt, cnt.toInt, need)
        case 5 => lzwDecode(b, off.toInt, cnt.toInt, need)
        case 8 | 32946 => inflate(b, off.toInt, cnt.toInt, need)
      }
    }

    // predictor 2: horizontal differencing — each sample is a delta
    // against the previous pixel's same channel, per buffer row;
    // `stride` = samples per pixel IN THIS BUFFER (spp for chunky,
    // 1 inside a separate plane)
    def undoPredictorStride(data: Array[Byte], rows: Int, rowBytes: Int,
                            stride: Int): Unit =
      if (predictor == 2) {
        var r0 = 0
        while (r0 < rows) {
          val rowAt = r0 * rowBytes
          var i = stride
          while (i < rowBytes) {
            data(rowAt + i) = (data(rowAt + i) + data(rowAt + i - stride)).toByte
            i += 1
          }
          r0 += 1
        }
      }

    def undoPredictor(data: Array[Byte], rows: Int, rowBytes: Int): Unit =
      undoPredictorStride(data, rows, rowBytes, spp.toInt)

    // accumulate `rows` buffer rows; each holds `bufW` pixels of which
    // the first `validW` are image pixels (tiles pad right/bottom edges
    // — padding never reaches the statistics)
    def accumRows(data: Array[Byte], rows: Int, bufW: Int, validW: Int): Unit = {
      val sppI = spp.toInt
      val stride = bufW * sppI
      var r = 0
      while (r < rows) {
        var p = r * stride
        var x = 0
        while (x < validW) {
          var pr = 0; var pg = 0; var pb = 0
          if (sppI == 3) {
            pr = data(p) & 0xff; pg = data(p + 1) & 0xff
            pb = data(p + 2) & 0xff
            p += 3
          } else {
            val v0 = data(p) & 0xff
            p += 1
            if (photometric == 3) {
              // ColorMap: 3 planes of 256 16-bit entries, scaled to 8-bit
              pr = (cmap(v0) >> 8).toInt
              pg = (cmap(256 + v0) >> 8).toInt
              pb = (cmap(512 + v0) >> 8).toInt
            } else {
              val v = if (photometric == 0) 255 - v0 else v0 // WhiteIsZero
              pr = v; pg = v; pb = v
            }
          }
          sumR += pr; sumG += pg; sumB += pb
          val luma = 299 * pr + 587 * pg + 114 * pb
          var bucket = luma / 31875
          if (bucket > 7) bucket = 7
          hist(bucket) += 1L
          x += 1
        }
        r += 1
      }
    }

    // planar-config-2 accumulation: one same-geometry buffer per channel
    def accumRowsPlanar(cr: Array[Byte], cg: Array[Byte], cb: Array[Byte],
                        rows: Int, bufW: Int, validW: Int): Unit = {
      var r = 0
      while (r < rows) {
        val rowAt = r * bufW
        var x = 0
        while (x < validW) {
          val pr = cr(rowAt + x) & 0xff
          val pg = cg(rowAt + x) & 0xff
          val pb = cb(rowAt + x) & 0xff
          sumR += pr; sumG += pg; sumB += pb
          val luma = 299 * pr + 587 * pg + 114 * pb
          var bucket = luma / 31875
          if (bucket > 7) bucket = 7
          hist(bucket) += 1L
          x += 1
        }
        r += 1
      }
    }

    if (tiled) {
      val across = ((w + tileW - 1) / tileW).toInt
      val down = ((h + tileL - 1) / tileL).toInt
      val perPlane = across * down
      if (planarSep) {
        // one tile grid PER CHANNEL, plane-major tile order (spec)
        if (tileOffsets.length != 3 * perPlane) return null
        val needL = tileW * tileL
        if (needL <= 0 || needL > (1L << 28)) return null
        val need = needL.toInt
        var ty = 0
        while (ty < down) {
          val validRows = math.min(tileL, h - ty.toLong * tileL).toInt
          var tx = 0
          while (tx < across) {
            val idx = ty * across + tx
            val cr = decodeRegion(tileOffsets(idx), tileCounts(idx), need)
            val cg = decodeRegion(tileOffsets(perPlane + idx),
              tileCounts(perPlane + idx), need)
            val cb = decodeRegion(tileOffsets(2 * perPlane + idx),
              tileCounts(2 * perPlane + idx), need)
            if (cr == null || cg == null || cb == null) return null
            undoPredictorStride(cr, tileL.toInt, tileW.toInt, 1)
            undoPredictorStride(cg, tileL.toInt, tileW.toInt, 1)
            undoPredictorStride(cb, tileL.toInt, tileW.toInt, 1)
            val validW = math.min(tileW, w - tx.toLong * tileW).toInt
            accumRowsPlanar(cr, cg, cb, validRows, tileW.toInt, validW)
            tx += 1
          }
          ty += 1
        }
      } else {
        if (tileOffsets.length != perPlane) return null
        // every tile decompresses to the FULL padded tile size (spec)
        val needL = tileW * tileL * spp
        if (needL <= 0 || needL > (1L << 28)) return null
        val need = needL.toInt
        var ty = 0
        while (ty < down) {
          val validRows = math.min(tileL, h - ty.toLong * tileL).toInt
          var tx = 0
          while (tx < across) {
            val idx = ty * across + tx
            val data = decodeRegion(tileOffsets(idx), tileCounts(idx), need)
            if (data == null) return null
            undoPredictor(data, tileL.toInt, (tileW * spp).toInt)
            val validW = math.min(tileW, w - tx.toLong * tileW).toInt
            accumRows(data, validRows, tileW.toInt, validW)
            tx += 1
          }
          ty += 1
        }
      }
    } else if (planarSep) {
      // strips plane-major: strips 0..n-1 = R's row bands, then G, then B
      val nStrips = ((h + rps - 1) / rps).toInt
      if (offsets.length != 3 * nStrips) return null
      var strip = 0
      var row = 0L
      while (strip < nStrips) {
        val rowsHere = math.min(rps, h - row)
        val needL = w * rowsHere // one channel's bytes for the band
        if (needL < 0 || needL > (1L << 28)) return null
        val cr = decodeRegion(offsets(strip), counts(strip), needL.toInt)
        val cg = decodeRegion(offsets(nStrips + strip),
          counts(nStrips + strip), needL.toInt)
        val cb = decodeRegion(offsets(2 * nStrips + strip),
          counts(2 * nStrips + strip), needL.toInt)
        if (cr == null || cg == null || cb == null) return null
        undoPredictorStride(cr, rowsHere.toInt, w.toInt, 1)
        undoPredictorStride(cg, rowsHere.toInt, w.toInt, 1)
        undoPredictorStride(cb, rowsHere.toInt, w.toInt, 1)
        accumRowsPlanar(cr, cg, cb, rowsHere.toInt, w.toInt, w.toInt)
        row += rowsHere
        strip += 1
      }
    } else {
      val rowBytes = w * spp
      val nStrips = ((h + rps - 1) / rps).toInt
      if (offsets.length != nStrips) return null
      var strip = 0
      var row = 0L
      while (strip < nStrips) {
        val rowsHere = math.min(rps, h - row)
        val needL = rowBytes * rowsHere
        // raster-size guard: a decompressed strip larger than 256 MiB is
        // outside any sane archive scan — reject before allocating
        if (needL < 0 || needL > (1L << 28)) return null
        val data = decodeRegion(offsets(strip), counts(strip), needL.toInt)
        if (data == null) return null
        undoPredictor(data, rowsHere.toInt, rowBytes.toInt)
        accumRows(data, rowsHere.toInt, w.toInt, w.toInt)
        row += rowsHere
        strip += 1
      }
    }
    new GenericInternalRow(Array[Any](spp.toInt, w.toInt, h.toInt,
      w * h, sumR, sumG, sumB) ++ hist.map(v => v: Any))
  }

  /** PackBits (compression 32773) — exact-length decode, null on any
    * overrun or shortfall.
    */
  private def unpackBits(b: Array[Byte], off: Int, len: Int,
                         outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var p = off; val end = off + len
    var o = 0
    while (o < outLen && p < end) {
      val nb = b(p); p += 1
      if (nb >= 0) {
        val run = nb + 1
        if (p + run > end || o + run > outLen) return null
        System.arraycopy(b, p, out, o, run)
        p += run; o += run
      } else if (nb != -128) {
        val run = 1 - nb
        if (p >= end || o + run > outLen) return null
        java.util.Arrays.fill(out, o, o + run, b(p))
        p += 1; o += run
      } // -128: no-op
    }
    if (o == outLen) out else null
  }

  /** TIFF LZW (compression 5) — MSB-first codes, CLEAR=256, EOI=257,
    * the spec's EARLY code-width change (bump at next == 2^width − 1).
    * Exact-length decode; null on malformed streams.
    */
  private def lzwDecode(b: Array[Byte], off: Int, len: Int,
                        outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var o = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var next = 258; var width = 9
    var bitPos = 0L
    val endBit = len.toLong * 8
    def read(): Int = {
      if (bitPos + width > endBit) return 257 // truncated: treat as EOI
      var v = 0; var i = 0
      while (i < width) {
        val at = off + (bitPos >> 3).toInt
        v = (v << 1) | ((b(at) >> (7 - (bitPos & 7).toInt)) & 1)
        bitPos += 1; i += 1
      }
      v
    }
    // expand `code`'s string onto the stack; returns (top index, first byte)
    def expand(code: Int): Int = {
      var c = code; var sp = 0
      while (c >= 258) {
        if (sp >= 4096) return -1
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      stack(sp) = c.toByte
      sp
    }
    def emit(top: Int): Boolean = {
      var i = top
      while (i >= 0) {
        if (o >= outLen) return false
        out(o) = stack(i); o += 1; i -= 1
      }
      true
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == 257) done = true
      else if (code == 256) { next = 258; width = 9; prev = -1 }
      else if (prev == -1) {
        if (code > 255) return null // first code after CLEAR must be a byte
        if (o >= outLen) return null
        out(o) = code.toByte; o += 1
        prev = code
      } else {
        var top = 0
        if (code < next) {
          top = expand(code)
          if (top < 0) return null
        } else if (code == next) {
          // KwKwK: string(prev) + first(string(prev))
          top = expand(prev)
          if (top < 0 || top >= 4096) return null
          // shift up by one and append first byte at index 0... cheaper:
          // first byte of string(prev) is stack(top); re-push it below
          val first = stack(top)
          var i = 0
          // move the whole run up one slot so the duplicate first byte
          // can sit at index 0 (emitted last)
          while (top - i >= 0) { stack(top + 1 - i) = stack(top - i); i += 1 }
          stack(0) = first
          top += 1
        } else return null
        if (!emit(top)) return null
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = stack(top) // first byte of the emitted string
          next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
      if (o >= outLen && !done) {
        // stream must close with EOI (possibly after padding) — accept
        done = true
      }
    }
    if (o == outLen) out else null
  }

  /** zlib Deflate (compression 8 / 32946) via the JDK Inflater —
    * exact-length decode, null on malformed or mis-sized streams.
    */
  private def inflate(b: Array[Byte], off: Int, len: Int,
                      outLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, off, len)
      val out = new Array[Byte](outLen)
      var o = 0
      while (o < outLen && !inf.finished()) {
        val n = inf.inflate(out, o, outLen - o)
        if (n == 0 && inf.needsInput()) return null // truncated
        o += n
      }
      if (o == outLen) out else null
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }
}

/** Expression wrapper: the [[TiffRaster.schema]] struct from a binary
  * column; null outside the stated subset. Eval and codegen share
  * [[TiffRaster.parse]].
  */
case class TiffStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TiffRaster.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"tiff_stats needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    TiffRaster.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.TiffRaster.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
