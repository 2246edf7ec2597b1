package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video container metadata from the ISO BMFF (MP4/MOV) box structure:
  * the `ftyp` major brand plus the `moov/mvhd` timescale and duration —
  * a pure top-level box walk over the first bytes, no codec library, no
  * frame decode (the [[ImageHeader]]/[[AudioHeader]] contract extended to
  * the third modality). Runs inside the scan via one static call, so the
  * stage stays whole-stage-compiled.
  */
object VideoHeader {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", IntegerType, nullable = false)))

  /** Column form: struct(format, brand, timescale, duration); null for
    * payloads without a leading ftyp box or without a version-0 mvhd.
    */
  def video_meta(payload: Column): Column =
    ColumnBridge.column(VideoMetaExpr(ColumnBridge.expression(payload)))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  /** Returns (format, brand, timescale, duration) or null. Box sizes are
    * UNSIGNED 32-bit and attacker-controlled: all cursor arithmetic runs
    * in Long so a size near 2³¹ can't wrap an Int guard negative and
    * index out of bounds — a torn/adversarial row must yield null, never
    * throw (one bad payload would otherwise fail the whole scan).
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16 || fourcc(b, 4) != "ftyp") return null
    val brand = fourcc(b, 8)
    var i = 0L
    while (i + 8 <= b.length) {
      val size = be32(b, i.toInt).toLong & 0xffffffffL
      if (size < 8 || i + size > b.length) return null
      if (fourcc(b, i.toInt + 4) == "moov") {
        var j = i + 8
        val end = i + size
        while (j + 8 <= end) {
          val cs = be32(b, j.toInt).toLong & 0xffffffffL
          if (cs < 8 || j + cs > end) return null
          if (fourcc(b, j.toInt + 4) == "mvhd") {
            // version-0 mvhd: ver/flags(4) ctime(4) mtime(4) scale(4) dur(4)
            // bounds first — an mvhd box ending at the buffer end must
            // not read past it
            if (j + 28 > end || b(j.toInt + 8) != 0) return null
            return new GenericInternalRow(Array[Any](
              UTF8String.fromString("mp4"), UTF8String.fromString(brand),
              be32(b, j.toInt + 20), be32(b, j.toInt + 24)))
          }
          j += cs
        }
        return null
      }
      i += size
    }
    null
  }
}

/** Expression wrapper sharing [[VideoHeader.parse]] between eval and
  * codegen (one static call inside the generated stage).
  */
case class VideoMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VideoHeader.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, s"video_meta needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    VideoHeader.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.VideoHeader.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VideoMetaExpr =
    copy(child = newChild)
}

/** Content-type sniffing by magic bytes — the dispatch step in front of
  * the typed decoders: a mixed binary column routes each payload to the
  * right modality (or quarantine) without trusting any recorded
  * extension/mime. Never null for non-null input ('unknown' is an
  * answer).
  */
object Sniff {
  def content_type(payload: Column): Column =
    ColumnBridge.column(ContentTypeExpr(ColumnBridge.expression(payload)))

  def sniff(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      return "png"
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) return "jpeg"
    if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') return "gif"
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') return "wav"
    if (b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')
      return "mp4"
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') return "bmp"
    "unknown"
  }
}

case class ContentTypeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, s"content_type needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Sniff.sniff(v.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.multimodal.Sniff.sniff($c))")

  override protected def withNewChildInternal(newChild: Expression): ContentTypeExpr =
    copy(child = newChild)
}
