package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio container metadata from the RIFF/WAVE header — the audio twin of
  * [[ImageHeader]]: real byte-level decode of the fmt chunk (channels,
  * sample rate, bit depth) with no audio library, so it runs inside the
  * scan; sample-level work stays behind the stubbed decode path.
  */
object AudioHeader {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false)))

  def audio_meta(payload: Column): Column =
    ColumnBridge.column(AudioMetaExpr(ColumnBridge.expression(payload)))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  /** (format, channels, sample_rate, bits_per_sample) or null. Walks RIFF
    * chunks to `fmt ` so files with LIST/INFO chunks ahead of fmt parse too.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 28 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return null
        val d = i + 8
        return new GenericInternalRow(Array[Any](
          UTF8String.fromString("wav"),
          le16(b, d + 2), le32(b, d + 4), le16(b, d + 14)))
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
      if (size < 0) return null
    }
    null
  }
}

case class AudioMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioHeader.schema
  // null for unrecognized payloads regardless of input nullability (see
  // ImageMetaExpr)
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, s"audio_meta needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    AudioHeader.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.AudioHeader.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioMetaExpr =
    copy(child = newChild)
}
