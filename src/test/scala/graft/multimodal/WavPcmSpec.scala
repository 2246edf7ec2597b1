package graft.multimodal

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M11: the WAV PCM decoder against REAL files written by the JDK's own
  * WAV encoder (javax.sound.sampled — an external writer this module
  * shares no code with), plus subset boundaries and the codegen path.
  */
class WavPcmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def jdkWav(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0)
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false) // LE signed
    val raw = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodes a JDK-written WAV to exact waveform statistics") {
    val samples = Array[Short](0, 1000, -2000, 32767, -32768, 500, -500, 12345)
    val bytes = jdkWav(16000, 2, samples)
    val row = WavPcm.parse(bytes)
    assert(row != null, "JDK WAV rejected")
    assert(row.getInt(0) == 2 && row.getInt(1) == 16000)
    assert(row.getLong(2) == 4L) // frames
    assert(row.getLong(3) == 4L * 1000 / 16000)
    assert(row.getLong(4) == 32768L) // peak
    val sumSq = samples.map(s => s.toLong * s).sum
    assert(row.getLong(5) == sumSq)
    assert(row.getLong(6) == 2L) // both clip rails
  }

  test("interpreted eval and codegen agree on the expression path") {
    val bytes = jdkWav(8000, 1, Array[Short](100, -100, 200))
    val r = Seq(Tuple1(bytes)).toDF("payload")
      .select(WavPcm.wav_stats(col("payload")).as("st"))
      .select("st.n_frames", "st.peak_abs", "st.sum_sq").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((3L, 200L, 100L * 100 + 100L * 100 + 200L * 200)))
  }

  test("subset boundaries return null, never misread") {
    val good = jdkWav(8000, 1, Array[Short](1, 2, 3, 4))
    // truncated data region
    assert(WavPcm.parse(good.dropRight(3)) == null)
    // wrong magic
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(WavPcm.parse(bad) == null)
    // non-PCM format code: find the fmt chunk and flip audio_format
    val idx = (12 until good.length - 8).find(i =>
      good(i) == 'f' && good(i + 1) == 'm' && good(i + 2) == 't').get
    val nonPcm = good.clone(); nonPcm(idx + 8) = 3.toByte // IEEE float
    assert(WavPcm.parse(nonPcm) == null)
    // 8-bit depth: flip bits_per_sample
    val depth = good.clone(); depth(idx + 8 + 14) = 8.toByte
    assert(WavPcm.parse(depth) == null)
    assert(WavPcm.parse(null) == null)
  }
}
