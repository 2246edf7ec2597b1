package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M10: TRUE raster decode — the first multimodal operator past M9's
  * patch hash whose DECODE step is real, not stubbed. Uncompressed
  * 24-bit BMP is raw bytes (BITMAPFILEHEADER + BITMAPINFOHEADER +
  * bottom-up BGR rows padded to 4-byte multiples): no codec library is
  * needed, so the pixel walk runs as pure byte arithmetic inside
  * whole-stage codegen — one static call per row, the ImageHeader
  * posture extended from the header to the raster.
  *
  * Output: per-image pixel statistics a training-data pipeline filters
  * on — dimensions, channel sums (exact integers), and an 8-bucket
  * luminance histogram (integer luma = 299R + 587G + 114B per pixel,
  * buckets of width 31875 ≡ 255000/8, top value clamped) — resolution
  * stats at pixel truth, dark/blown-out screens, flat-image detection.
  *
  * Subset honored (reject-by-null, never misread): 'BM' magic,
  * BITMAPINFOHEADER-family DIB (size ≥ 40), bpp = 24, compression =
  * BI_RGB (0), positive width, data region fully inside the payload;
  * negative height (top-down rows) is accepted — orientation does not
  * change any of these statistics. Other depths/compressions return
  * null. Validated against the JDK's own BMP encoder in the spec
  * (ImageIO ships with the JVM — a real external-writer check, no
  * image library added).
  */
object BmpRaster {

  val schema: StructType = StructType(
    Seq(StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)) ++
      (0 until 8).map(i => StructField(s"h$i", LongType, nullable = false)))

  /** Column form: the per-image statistics struct, null for payloads
    * outside the stated subset.
    */
  def bmp_stats(payload: Column): Column =
    ColumnBridge.column(BmpStatsExpr(ColumnBridge.expression(payload)))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Decode + accumulate in one pass; null outside the subset. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOffset = le32(b, 10)
    if (le32(b, 14) < 40) return null // BITMAPCOREHEADER etc.
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0) return null
    if (le16(b, 28) != 24) return null // bpp
    if (le32(b, 30) != 0) return null // BI_RGB only
    val rowSize = ((3 * w + 3) / 4) * 4
    if (dataOffset < 0 || dataOffset.toLong + rowSize.toLong * h > b.length)
      return null
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)
    var y = 0
    while (y < h) {
      var off = dataOffset + y * rowSize
      var x = 0
      while (x < w) {
        val pb = b(off) & 0xff
        val pg = b(off + 1) & 0xff
        val pr = b(off + 2) & 0xff
        sumR += pr; sumG += pg; sumB += pb
        val luma = 299 * pr + 587 * pg + 114 * pb
        var bucket = luma / 31875
        if (bucket > 7) bucket = 7
        hist(bucket) += 1L
        off += 3
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](w, h, w.toLong * h,
      sumR, sumG, sumB) ++ hist.map(v => v: Any))
  }
}

/** Expression wrapper: the [[BmpRaster.schema]] struct from a binary
  * column; null outside the stated subset. Eval and codegen share
  * [[BmpRaster.parse]].
  */
case class BmpStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BmpRaster.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"bmp_stats needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    BmpRaster.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.BmpRaster.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpStatsExpr =
    copy(child = newChild)
}
