package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M12: TRUE compressed-raster decode — [[BmpRaster]]'s contract on a
  * format that is NOT raw bytes: PNG. The pixels sit behind a zlib
  * stream and PNG's per-scanline predictive filters, and both are
  * decoded for real — `java.util.zip.Inflater` (the JDK's own zlib,
  * no library added) plus a full None/Sub/Up/Average/Paeth filter
  * reconstruction (RFC 2083 §6) — before the same per-image statistics
  * the BMP path emits: dimensions, exact channel sums, 8-bucket
  * integer-luma histogram. One static call per row inside whole-stage
  * codegen; the decompression is CPU-local per image, so the operator
  * scales exactly as the scan does.
  *
  * Subset honored (reject-by-null, never misread): 8-byte signature,
  * IHDR bit depth 8, color type 2 (truecolor RGB), compression 0,
  * filter method 0, no interlace; IDAT chunks are concatenated in
  * order per the spec; chunk CRCs are not verified (decode-only
  * posture); rasters over 2²⁸ reconstructed bytes are rejected (the
  * decompression-bomb guard — a 100 TB scan must bound per-row
  * allocation from untrusted headers). Everything else returns null.
  * The spec validates against the JDK's OWN PNG encoder (ImageIO) —
  * a real external writer exercising genuine deflate + filter choices.
  */
object PngRaster {

  val schema: StructType = BmpRaster.schema

  /** Column form: the per-image statistics struct, null for payloads
    * outside the stated subset.
    */
  def png_stats(payload: Column): Column =
    ColumnBridge.column(PngStatsExpr(ColumnBridge.expression(payload)))

  private val Sig: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** Decode (chunk walk → inflate → filter reconstruction) and
    * accumulate in one pass; null outside the subset.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 8) return null
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != Sig(i)) return null; i += 1 }
    var off = 8
    var w = -1
    var h = -1
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended && off + 8 <= b.length) {
      val len = be32(b, off)
      if (len < 0 || off + 12L + len > b.length) return null
      val t0 = b(off + 4) & 0xff
      val t1 = b(off + 5) & 0xff
      val t2 = b(off + 6) & 0xff
      val t3 = b(off + 7) & 0xff
      if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
        if (len != 13 || sawIhdr) return null
        w = be32(b, off + 8)
        h = be32(b, off + 12)
        val bitDepth = b(off + 16) & 0xff
        val colorType = b(off + 17) & 0xff
        val compression = b(off + 18) & 0xff
        val filterMethod = b(off + 19) & 0xff
        val interlace = b(off + 20) & 0xff
        if (bitDepth != 8 || colorType != 2 || compression != 0 ||
          filterMethod != 0 || interlace != 0) return null
        if (w <= 0 || h <= 0) return null
        sawIhdr = true
      } else if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        if (!sawIhdr) return null
        idat.write(b, off + 8, len)
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        ended = true
      }
      off += 12 + len
    }
    if (!sawIhdr || idat.size() == 0) return null
    val expect = (1L + 3L * w) * h
    if (expect > (1L << 28)) return null // decompression-bomb guard
    val out = new Array[Byte](expect.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var total = 0
      while (total < out.length && !inf.finished()) {
        val k =
          try inf.inflate(out, total, out.length - total)
          catch { case _: java.util.zip.DataFormatException => return null }
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        total += k
      }
      if (total != out.length) return null
    } finally inf.end()
    val rowBytes = 3 * w
    val stride = 1 + rowBytes
    val prev = new Array[Int](rowBytes)
    val cur = new Array[Int](rowBytes)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)
    var y = 0
    while (y < h) {
      val ft = out(y * stride) & 0xff
      if (ft > 4) return null
      var x = 0
      while (x < rowBytes) {
        val raw = out(y * stride + 1 + x) & 0xff
        val a = if (x >= 3) cur(x - 3) else 0
        val up = if (y > 0) prev(x) else 0
        val ul = if (x >= 3 && y > 0) prev(x - 3) else 0
        val rec = ft match {
          case 0 => raw
          case 1 => (raw + a) & 0xff
          case 2 => (raw + up) & 0xff
          case 3 => (raw + ((a + up) >> 1)) & 0xff
          case _ => // Paeth
            val p = a + up - ul
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul
            (raw + pred) & 0xff
        }
        cur(x) = rec
        x += 1
      }
      var px = 0
      while (px < w) {
        val r = cur(3 * px)
        val g = cur(3 * px + 1)
        val bl = cur(3 * px + 2)
        sumR += r; sumG += g; sumB += bl
        val luma = 299 * r + 587 * g + 114 * bl
        var bucket = luma / 31875
        if (bucket > 7) bucket = 7
        hist(bucket) += 1L
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowBytes)
      y += 1
    }
    new GenericInternalRow(Array[Any](w, h, w.toLong * h,
      sumR, sumG, sumB) ++ hist.map(v => v: Any))
  }
}

/** Expression wrapper: the [[PngRaster.schema]] struct from a binary
  * column; null outside the stated subset. Eval and codegen share
  * [[PngRaster.parse]].
  */
case class PngStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PngRaster.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"png_stats needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    PngRaster.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.PngRaster.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PngStatsExpr =
    copy(child = newChild)
}
