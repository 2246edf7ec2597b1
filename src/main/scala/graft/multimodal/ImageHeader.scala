package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real (not stubbed) image metadata decode from raster container headers:
  * PNG IHDR, JPEG SOF markers, GIF logical screen descriptor, BMP
  * BITMAPINFOHEADER. Pure byte arithmetic on the first bytes of the
  * payload — no image library, no full decode, so it runs inside the scan
  * at full speed; pixel-level work stays behind the stubbed decode path
  * (Binary.scala).
  */
object ImageHeader {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Column form: struct(format, width, height), null for unrecognized
    * payloads. Codegen calls [[parse]] directly — one static call, the
    * stage stays whole-stage-compiled.
    */
  def image_meta(payload: Column): Column =
    ColumnBridge.column(ImageMetaExpr(ColumnBridge.expression(payload)))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** Returns (format, width, height) or null if no recognized header. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    // PNG: 8-byte signature, IHDR chunk fixed at offset 8 (len+type+data)
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a / GIF89a: logical screen w/h, little-endian u16
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // BMP: only BITMAPINFOHEADER-family DIBs (header size >= 40) carry
    // 32-bit w/h at 18/22 — the 12-byte BITMAPCOREHEADER uses u16 fields
    // there and must be rejected, not misread (height<0 = top-down)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) >= 40)
      return row("bmp", le32(b, 18), math.abs(le32(b, 22)))
    // JPEG: walk markers to the first start-of-frame (C0–CF minus C4/C8/CC)
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // desynced, not a marker
        val m = b(i + 1) & 0xff
        if (m == 0xff) { i += 1 } // fill byte
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= b.length) return null
          return row("jpeg", be16(b, i + 7), be16(b, i + 5))
        } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) { i += 2 } // no payload
        else {
          if (i + 3 >= b.length) return null
          i += 2 + be16(b, i + 2)
        }
      }
      return null
    }
    null
  }
}

/** Expression wrapper: struct(format, width, height) from a binary column;
  * null for unrecognized content. Eval and codegen share [[ImageHeader.parse]].
  */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageHeader.schema
  // null for unrecognized payloads regardless of input nullability — the
  // default (child.nullable) would let the planner mark this non-nullable
  // and both codegen (assignment to an undeclared isNull) and downstream
  // null tracking would break
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, s"image_meta needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    ImageHeader.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.ImageHeader.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageMetaExpr =
    copy(child = newChild)
}
