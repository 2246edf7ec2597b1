package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M13: COMPANDED-audio decode — G.711 μ-law (WAVE format 7) and A-law
  * (format 6), the telephony codecs behind half the world's call-center
  * and voice-agent corpora. Unlike [[WavPcm]]'s raw samples, each 8-bit
  * byte must be EXPANDED through the CCITT segment/mantissa formula to
  * its 16-bit linear value before any loudness statistic means
  * anything; both expansions are closed-form integer arithmetic
  * (complement / even-bit-invert, 3-bit segment, 4-bit mantissa), so
  * the decode runs inside whole-stage codegen AND replays exactly in
  * any SQL engine — the oracle decodes the same bytes arithmetically.
  *
  *   μ-law: u = ~b;  mag = ((m·8 + 132) << e) − 132, sign bit set → −
  *   A-law: a = b⊕0x55; mag = seg=0 ? t+8 : (t+264) << (seg−1),
  *          t = m·16, sign bit set → +   (G.711's inverted convention)
  *
  * Output: channels, rate, codec (6|7), frames, exact duration_ms,
  * peak |sample|, Σ sample² (the loudness numerator), and the count of
  * full-scale samples (32124 μ / 32256 A — the companded clipping
  * screen). Subset honored (reject-by-null): RIFF/WAVE, fmt chunk with
  * audio_format 6 or 7 at 8 bits/sample, data chunk inside the
  * payload. The spec validates against the JDK's OWN μ-law/A-law
  * codecs (javax.sound.sampled encodes PCM→companded; we decode the
  * result and must agree with the JDK's round-trip).
  */
object G711 {

  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("codec", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("n_fullscale", LongType, nullable = false)))

  /** Column form: the companded-waveform statistics struct, null
    * outside the stated subset.
    */
  def g711_stats(payload: Column): Column =
    ColumnBridge.column(G711StatsExpr(ColumnBridge.expression(payload)))

  /** CCITT μ-law expansion of one byte to the linear 16-bit sample. */
  def ulawToLinear(b: Int): Int = {
    val u = (~b) & 0xff
    val e = (u >> 4) & 7
    val m = u & 0x0f
    val mag = (((m << 3) + 0x84) << e) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** CCITT A-law expansion of one byte to the linear 16-bit sample. */
  def alawToLinear(b: Int): Int = {
    val a = (b ^ 0x55) & 0xff
    val t = (a & 0x0f) << 4
    val seg = (a >> 4) & 7
    val mag = if (seg == 0) t + 8 else (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  /** Decode + accumulate in one pass; null outside the subset. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 28 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return null
    var channels = -1; var rate = -1; var codec = -1
    var dataOff = -1; var dataLen = -1
    var i = 12
    while (i + 8 <= b.length && (codec < 0 || dataOff < 0)) {
      val size = le32(b, i + 4)
      if (size < 0) return null
      if (tag(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return null
        val d = i + 8
        val fmt = le16(b, d)
        if (fmt != 6 && fmt != 7) return null // A-law / μ-law only
        codec = fmt
        channels = le16(b, d + 2)
        rate = le32(b, d + 4)
        if (le16(b, d + 14) != 8) return null // companded is 8-bit
      } else if (tag(b, i, "data")) {
        dataOff = i + 8; dataLen = size
      }
      i += 8 + size + (size & 1)
    }
    if (channels <= 0 || rate <= 0 || codec < 0 || dataOff < 0) return null
    if (dataOff.toLong + dataLen > b.length) return null
    val nFrames = dataLen.toLong / channels
    val fullScale = if (codec == 7) 32124 else 32256
    var peak = 0L; var sumSq = 0L; var nFull = 0L
    var j = dataOff
    val end = dataOff + dataLen
    while (j < end) {
      val s = if (codec == 7) ulawToLinear(b(j) & 0xff)
      else alawToLinear(b(j) & 0xff)
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumSq += s.toLong * s
      if (a == fullScale) nFull += 1
      j += 1
    }
    new GenericInternalRow(Array[Any](channels, rate, codec, nFrames,
      nFrames * 1000L / rate, peak, sumSq, nFull))
  }
}

/** Expression wrapper: the [[G711.schema]] struct from a binary column;
  * null outside the stated subset. Eval and codegen share
  * [[G711.parse]].
  */
case class G711StatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = G711.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"g711_stats needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    G711.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.G711.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): G711StatsExpr =
    copy(child = newChild)
}
