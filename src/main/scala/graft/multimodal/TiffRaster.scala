package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M17: TIFF baseline raster decode — the scanning/scientific archive
  * format (and the one whose uncompressed form is lossless, so an
  * external-encoder round-trip is EXACT, not tolerance-bounded).
  * Implements the real structure: both byte orders (`II` and `MM`),
  * the IFD entry walk with SHORT/LONG value types and the
  * inline-vs-offset value rule, BitsPerSample arrays, and multi-strip
  * assembly — then the M10 pixel-statistics walk over the strips, all
  * inside whole-stage codegen.
  *
  * Subset honored (reject-by-null, never misread): single-IFD
  * baseline, Compression = 1 (none), 8 bits per sample on every
  * channel, SamplesPerPixel 1 (BlackIsZero gray) or 3 (RGB), chunky
  * planar configuration, strip-organized (tiled TIFFs rejected),
  * strip regions fully inside the payload. Gray contributes equally
  * to all three channel sums (the M15 contract).
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
    var bits: Array[Long] = Array(1L) // TIFF default: 1 bit
    var offsets: Array[Long] = null
    var counts: Array[Long] = null
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
        case 322 | 323 | 324 | 325 => return null // tiled
        case _ => // ignore (resolution, software, ...)
      }
      e += 1
    }
    if (w <= 0 || h <= 0 || w > Int.MaxValue / 4 || h > Int.MaxValue) return null
    if (compression != 1 || planar != 1) return null
    if (spp != 1 && spp != 3) return null
    if (spp == 1 && photometric != 1 && photometric != 0) return null
    if (spp == 3 && photometric != 2) return null
    if (bits.length != spp || bits.exists(_ != 8L)) return null
    if (offsets == null || counts == null ||
      offsets.length != counts.length) return null
    if (rps <= 0) return null
    // tag 278 default is "all rows in one strip" (spec: 2^32-1); clamp
    // to h so the ceiling division below can't overflow Long.MaxValue
    if (rps > h) rps = h

    val rowBytes = w * spp
    val nStrips = ((h + rps - 1) / rps).toInt
    if (offsets.length != nStrips) return null
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)
    var strip = 0
    var row = 0L
    while (strip < nStrips) {
      val rowsHere = math.min(rps, h - row)
      val need = rowBytes * rowsHere
      val off = offsets(strip)
      if (off < 0 || off + need > b.length || counts(strip) < need) return null
      var p = off.toInt
      var r = 0L
      while (r < rowsHere) {
        var x = 0L
        while (x < w) {
          val (pr, pg, pb) = if (spp == 3) {
            val t = ((b(p) & 0xff), (b(p + 1) & 0xff), (b(p + 2) & 0xff))
            p += 3; t
          } else {
            val v0 = b(p) & 0xff
            val v = if (photometric == 0) 255 - v0 else v0 // WhiteIsZero
            p += 1; (v, v, v)
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
      row += rowsHere
      strip += 1
    }
    new GenericInternalRow(Array[Any](spp.toInt, w.toInt, h.toInt,
      w * h, sumR, sumG, sumB) ++ hist.map(v => v: Any))
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
