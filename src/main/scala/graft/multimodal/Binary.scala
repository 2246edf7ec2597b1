package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata.
  *
  * The real decode libraries are not in this container, so the decoder is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is the
  * real production shape: [[Binary.decode]] is one static call inside a
  * whole-stage-codegen'd expression (the same pattern as the real
  * [[ImageHeader]]/[[AudioHeader]] parsers), so swapping it for an actual
  * codec changes nothing in the plan. A decoder that needs out-of-JVM
  * batching (GPU, Python imaging stack) would instead plug in at an Arrow
  * batch seam (`mapInArrow`/`mapInPandas` from the Python API); the
  * column contract (id + metadata struct) stays identical. At 100 TB the
  * payload column never shuffles: metadata is extracted first (narrow),
  * and only the small metadata projection participates in joins/aggs.
  */
object Binary {
  /** Metadata schema attached to every decoded payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** STUB decoder: derives deterministic fake dimensions from the payload
    * length (a real implementation would parse the image header here).
    */
  def stubDecode(payload: Array[Byte]): (Long, Int, Int, Int) = {
    val n = payload.length.toLong
    val width = (n % 640L).toInt + 1
    val height = (n % 480L).toInt + 1
    (n, width, height, 3)
  }

  /** The static call codegen compiles against — the seam where a real
    * codec replaces [[stubDecode]].
    */
  def decode(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val (n, w, h, c) = stubDecode(b)
    new GenericInternalRow(Array[Any](n, w, h, c))
  }

  /** Column form: struct(byte_len, width, height, channels). Runs inside
    * whole-stage codegen — no RDD round-trip, no object serialization.
    */
  def binary_meta(payload: Column): Column =
    ColumnBridge.column(BinaryMetaExpr(ColumnBridge.expression(payload)))

  /** Metadata extraction over (id, payload) rows: one narrow codegen'd
    * projection, schema `(id, byte_len, width, height, channels)`.
    */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).as("id"), binary_meta(col(payloadCol)).as("__m"))
      .select(col("id"), col("__m.byte_len"), col("__m.width"),
        col("__m.height"), col("__m.channels"))

  /** Deterministic frame/patch sampling: slice the payload at a fixed byte
    * stride (capped frame count) — the plumbing for "sample every Nth video
    * frame", with the per-frame decode stubbed to an md5 of the slice.
    * Narrow: explode multiplies rows but never shuffles the payload.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, stride: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(
      ceil(length(col(payloadCol)).cast("double") / stride).cast("int"),
      lit(maxFrames))
    df.withColumn("frame_idx", explode(sequence(lit(0), greatest(nFrames, lit(1)) - 1)))
      .withColumn("frame_offset", col("frame_idx") * stride)
      .withColumn("frame_md5",
        md5(expr(s"substring($payloadCol, frame_offset + 1, $stride)")))
  }
}

/** Expression wrapper: struct(byte_len, width, height, channels) from a
  * binary column. Eval and codegen share [[Binary.decode]].
  */
case class BinaryMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Binary.metaSchema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, s"binary_meta needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    Binary.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.Binary.decode($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BinaryMetaExpr =
    copy(child = newChild)
}
