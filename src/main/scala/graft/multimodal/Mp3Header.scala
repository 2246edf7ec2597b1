package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** M7: MP3 frame-header metadata — the compressed-audio sibling of
  * [[AudioHeader]]'s PCM/WAV decode: an optional ID3v2 tag is skipped by
  * its syncsafe size, then the first frame header's 4 big-endian bytes
  * yield bitrate, sample rate, and channel mode (ISO/IEC 11172-3 frame
  * layout — public specification). MPEG-1 Layer III frames only; other
  * version/layer combinations, reserved bitrate/samplerate indices,
  * free-format frames, and truncated payloads all return NULL — the
  * stated contract (a production decoder's job starts where header
  * sniffing ends, exactly like the WAV/PNG/ISO-BMFF twins).
  */
object Mp3Header {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("bitrate_kbps", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("has_id3", BooleanType, nullable = false)))

  /** MPEG-1 Layer III bitrate table, index 1..14 (0 = free, 15 = bad). */
  val BitratesKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, index 0..2 (3 = reserved). */
  val SampleRates: Array[Int] = Array(44100, 48000, 32000)

  def mp3_meta(payload: Column): Column =
    ColumnBridge.column(Mp3MetaExpr(ColumnBridge.expression(payload)))

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    var i = 0
    var hasId3 = false
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe 28-bit size; 7 bits per byte, high bit must be clear
      if ((b(6) | b(7) | b(8) | b(9)) < 0) return null
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      i = 10 + size
      hasId3 = true
    }
    if (i < 0 || i + 4 > b.length) return null
    if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return null
    val version = (b(i + 1) >> 3) & 3
    val layer = (b(i + 1) >> 1) & 3
    if (version != 3 || layer != 1) return null // MPEG-1 Layer III only
    val brIdx = (b(i + 2) >> 4) & 0xf
    if (brIdx == 0 || brIdx == 15) return null
    val srIdx = (b(i + 2) >> 2) & 3
    if (srIdx == 3) return null
    val mode = (b(i + 3) >> 6) & 3
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("mp3"), BitratesKbps(brIdx), SampleRates(srIdx),
      if (mode == 3) 1 else 2, hasId3))
  }
}

case class Mp3MetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Mp3Header.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"mp3_meta needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    Mp3Header.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.Mp3Header.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp3MetaExpr =
    copy(child = newChild)
}
