package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M15: Netpbm binary raster decode — P6 (PPM, RGB) and P5 (PGM,
  * grayscale), the interchange rasters scientific pipelines and
  * ffmpeg/ImageMagick toolchains emit as the no-codec lingua franca.
  * The whole format is an ASCII header (magic, whitespace/comment
  * tokens: width, height, maxval) followed by raw samples, so the
  * decode is pure byte arithmetic inside whole-stage codegen — the
  * M10 posture on the simplest real format.
  *
  * Output: the M10 pixel-statistics contract (dimensions, exact
  * channel sums, 8-bucket integer-luma histogram: 299R + 587G + 114B,
  * buckets of 31875) plus `channels` (3 for P6, 1 for P5 — gray
  * contributes to all three sums equally, so gray/color screens share
  * one report shape) and `maxval` as declared.
  *
  * Subset honored (reject-by-null, never misread): binary P5/P6 only
  * (ASCII P2/P3 and bitmap P1/P4 rejected), maxval 1..255 (2-byte
  * samples rejected), `#` comments anywhere between tokens per the
  * spec, exactly one whitespace byte between maxval and the sample
  * region, sample region fully inside the payload (trailing bytes
  * tolerated — Netpbm files are routinely concatenated).
  */
object Netpbm {

  val schema: StructType = StructType(
    Seq(StructField("channels", IntegerType, nullable = false),
      StructField("maxval", IntegerType, nullable = false),
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
  def pnm_stats(payload: Column): Column =
    ColumnBridge.column(PnmStatsExpr(ColumnBridge.expression(payload)))

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** Decode + accumulate in one pass; null outside the subset. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4 || b(0) != 'P') return null
    val channels = b(1) match {
      case '6' => 3
      case '5' => 1
      case _ => return null
    }
    // token scanner: whitespace separates, '#' comments run to newline
    var i = 2
    def nextInt(): Int = {
      var inComment = false
      while (i < b.length &&
        (inComment || isWs(b(i) & 0xff) || b(i) == '#')) {
        if (inComment) { if (b(i) == '\n') inComment = false }
        else if (b(i) == '#') inComment = true
        i += 1
      }
      if (i >= b.length || b(i) < '0' || b(i) > '9') return -1
      var v = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        if (v > Int.MaxValue) return -1
        i += 1
      }
      v.toInt
    }
    if (!isWs(b(2) & 0xff) && b(2) != '#') return null // ws after magic
    val w = nextInt(); if (w <= 0) return null
    val h = nextInt(); if (h <= 0) return null
    val maxval = nextInt(); if (maxval < 1 || maxval > 255) return null
    // exactly ONE whitespace byte, then samples
    if (i >= b.length || !isWs(b(i) & 0xff)) return null
    i += 1
    val nPx = w.toLong * h
    val nBytes = nPx * channels
    if (nBytes > Int.MaxValue - i || i + nBytes > b.length) return null
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)
    var p = 0L
    var off = i
    while (p < nPx) {
      val (r, g, bl) = if (channels == 3) {
        val t = ((b(off) & 0xff), (b(off + 1) & 0xff), (b(off + 2) & 0xff))
        off += 3; t
      } else {
        val v = b(off) & 0xff
        off += 1; (v, v, v)
      }
      sumR += r; sumG += g; sumB += bl
      val luma = 299 * r + 587 * g + 114 * bl
      var bucket = luma / 31875
      if (bucket > 7) bucket = 7
      hist(bucket) += 1L
      p += 1L
    }
    new GenericInternalRow(Array[Any](channels, maxval, w, h, nPx,
      sumR, sumG, sumB) ++ hist.map(v => v: Any))
  }
}

/** Expression wrapper: the [[Netpbm.schema]] struct from a binary
  * column; null outside the stated subset. Eval and codegen share
  * [[Netpbm.parse]].
  */
case class PnmStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Netpbm.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"pnm_stats needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    Netpbm.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.Netpbm.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
