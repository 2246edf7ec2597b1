package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** M8: FLAC STREAMINFO metadata — the lossless-audio sibling of
  * [[Mp3Header]]: the `fLaC` magic must be followed by a STREAMINFO
  * metadata block (type 0, length 34 — the format REQUIRES it first),
  * whose packed 64-bit field yields sample rate (20 bits), channel
  * count (3 bits + 1), bits per sample (5 bits + 1) and total samples
  * (36 bits) — the xiph.org FLAC format specification, public. Bad
  * magic, a non-STREAMINFO first block, a wrong block length, a
  * truncated payload, or the spec-invalid sample rate 0 all return NULL
  * (stated contract, like every header twin: sniffing ends where
  * decoding begins).
  */
object FlacHeader {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))

  def flac_meta(payload: Column): Column =
    ColumnBridge.column(FlacMetaExpr(ColumnBridge.expression(payload)))

  def parse(b: Array[Byte]): InternalRow = {
    // magic + block header + 34-byte STREAMINFO
    if (b == null || b.length < 8 + 34) return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    if ((b(4) & 0x7f) != 0) return null // first block must be STREAMINFO
    val blockLen = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (blockLen != 34) return null
    // packed 64-bit field at STREAMINFO offset 10 (bytes 18..25)
    val sr = ((b(18) & 0xff) << 12) | ((b(19) & 0xff) << 4) |
      ((b(20) & 0xf0) >> 4)
    if (sr == 0) return null // spec: 0 is invalid for audio streams
    val channels = ((b(20) >> 1) & 0x7) + 1
    val bps = (((b(20) & 1) << 4) | ((b(21) >> 4) & 0xf)) + 1
    val nSamples = ((b(21) & 0xfL) << 32) | ((b(22) & 0xffL) << 24) |
      ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 8) | (b(25) & 0xffL)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("flac"), sr, channels, bps, nSamples))
  }
}

case class FlacMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = FlacHeader.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"flac_meta needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    FlacHeader.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.FlacHeader.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FlacMetaExpr =
    copy(child = newChild)
}
