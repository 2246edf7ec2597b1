package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** M11: TRUE waveform decode — the audio twin of [[BmpRaster]], closing
  * the other half of the "decode beyond headers" gap. 16-bit PCM WAV is
  * raw bytes (RIFF chunks; interleaved little-endian signed samples in
  * `data`), so the sample walk is pure byte arithmetic in a native
  * codegen Expression — no audio library.
  *
  * Output: the waveform statistics an audio-corpus pipeline screens on —
  * frame count, duration in exact milliseconds (frames·1000 div rate),
  * peak absolute amplitude, exact sum of squared samples (the RMS/
  * loudness numerator as one integer — a 16-bit square is < 2³¹, so even
  * hours of audio stay far inside int64), and the count of clipped
  * samples (at ±full-scale) — silence/clipping/loudness screens at
  * sample truth.
  *
  * Subset honored (reject-by-null, never misread): RIFF/WAVE with a
  * PCM (`audio_format = 1`) 16-bit fmt chunk and a `data` chunk inside
  * the payload; chunk walk tolerates LIST/INFO chunks ahead of fmt (the
  * [[AudioHeader]] posture). Other formats/depths return null. The spec
  * validates against files written by the JDK's own WAV encoder
  * (javax.sound.sampled — an external writer sharing no code).
  */
object WavPcm {

  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("n_clipped", LongType, nullable = false)))

  /** Column form: the waveform statistics struct, null outside the
    * stated subset.
    */
  def wav_stats(payload: Column): Column =
    ColumnBridge.column(WavStatsExpr(ColumnBridge.expression(payload)))

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
    var channels = -1; var rate = -1
    var dataOff = -1; var dataLen = -1
    var i = 12
    while (i + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val size = le32(b, i + 4)
      if (size < 0) return null
      if (tag(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return null
        val d = i + 8
        if (le16(b, d) != 1) return null // PCM only
        channels = le16(b, d + 2)
        rate = le32(b, d + 4)
        if (le16(b, d + 14) != 16) return null // 16-bit only
      } else if (tag(b, i, "data")) {
        dataOff = i + 8; dataLen = size
      }
      i += 8 + size + (size & 1)
    }
    if (channels <= 0 || rate <= 0 || dataOff < 0) return null
    if (dataOff.toLong + dataLen > b.length) return null
    val nSamples = dataLen / 2
    val nFrames = nSamples / channels
    var peak = 0L; var sumSq = 0L; var clipped = 0L
    var j = dataOff
    val end = dataOff + nSamples * 2
    while (j < end) {
      val s = (le16(b, j) << 16) >> 16 // sign-extend
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumSq += s.toLong * s
      if (s == 32767 || s == -32768) clipped += 1
      j += 2
    }
    new GenericInternalRow(Array[Any](channels, rate, nFrames.toLong,
      nFrames.toLong * 1000L / rate, peak, sumSq, clipped))
  }
}

/** Expression wrapper: the [[WavPcm.schema]] struct from a binary
  * column; null outside the stated subset. Eval and codegen share
  * [[WavPcm.parse]].
  */
case class WavStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavPcm.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType,
      s"wav_stats needs binary, got ${child.dataType}")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    WavPcm.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.WavPcm.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavStatsExpr =
    copy(child = newChild)
}
