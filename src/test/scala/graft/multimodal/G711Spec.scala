package graft.multimodal

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M13: the G.711 expansions against the JDK's OWN μ-law/A-law codecs
  * (javax.sound.sampled converts PCM↔companded with its own CCITT
  * tables — an external implementation sharing no code), plus WAV-level
  * decode of JDK-written companded files, exact formula anchors, and
  * the loud subset boundaries.
  */
class G711Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pcmStream(samples: Array[Short], rate: Float): AudioInputStream = {
    val bytes = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
      new AudioFormat(rate, 16, 1, true, false), samples.length)
  }

  private def companded(samples: Array[Short], enc: AudioFormat.Encoding)
      : Array[Byte] = {
    val target = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val conv = AudioSystem.getAudioInputStream(target,
      pcmStream(samples, 8000f))
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(conv, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val testSamples: Array[Short] =
    (Array(0, 1, -1, 7, -8, 100, -100, 1000, -1000, 5000, -5000,
      20000, -20000, 32767, -32768) ++
      (0 until 200).map(i => (i * 313 - 31000))).map(_.toShort)

  test("decoding a JDK-encoded u-law WAV matches the JDK's own expansion") {
    val wav = companded(testSamples, AudioFormat.Encoding.ULAW)
    val row = G711.parse(wav)
    assert(row != null, "JDK u-law WAV rejected")
    assert(row.getInt(2) == 7)
    assert(row.getLong(3) == testSamples.length)
    // reference statistics: expand the same companded bytes back
    // through the JDK's converter and aggregate its PCM output
    val companded8 = {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
      val buf = new ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      Iterator.continually(in.read(tmp)).takeWhile(_ > 0)
        .foreach(n => buf.write(tmp, 0, n))
      buf.toByteArray
    }
    val ours = companded8.map(b => G711.ulawToLinear(b & 0xff))
    val jdk = {
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(companded8),
        new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false),
        companded8.length)
      val pcm = AudioSystem.getAudioInputStream(
        new AudioFormat(8000f, 16, 1, true, false), src)
      val buf = new ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      Iterator.continually(pcm.read(tmp)).takeWhile(_ > 0)
        .foreach(n => buf.write(tmp, 0, n))
      val b = buf.toByteArray
      Array.tabulate(b.length / 2)(i =>
        ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt)
    }
    assert(ours.length == jdk.length)
    ours.indices.foreach { i =>
      assert(ours(i) == jdk(i), s"u-law byte $i: ours ${ours(i)} jdk ${jdk(i)}")
    }
    assert(row.getLong(5) == ours.map(v => math.abs(v.toLong)).max)
    assert(row.getLong(6) == ours.map(v => v.toLong * v).sum)
  }

  test("A-law expansion matches the JDK's converter byte-for-byte") {
    val allBytes = (0 until 256).map(_.toByte).toArray
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(allBytes),
      new AudioFormat(AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false),
      allBytes.length)
    val pcm = AudioSystem.getAudioInputStream(
      new AudioFormat(8000f, 16, 1, true, false), src)
    val buf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    Iterator.continually(pcm.read(tmp)).takeWhile(_ > 0)
      .foreach(n => buf.write(tmp, 0, n))
    val b = buf.toByteArray
    val jdk = Array.tabulate(b.length / 2)(i =>
      ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt)
    (0 until 256).foreach { v =>
      assert(G711.alawToLinear(v) == jdk(v), s"A-law byte $v")
    }
  }

  test("formula anchors: zero codes and full-scale magnitudes") {
    assert(G711.ulawToLinear(0xff) == 0)
    assert(G711.ulawToLinear(0x7f) == 0)
    assert(G711.ulawToLinear(0x00) == -32124)
    assert(G711.ulawToLinear(0x80) == 32124)
    assert((0 until 256).map(b => math.abs(G711.alawToLinear(b))).max == 32256)
    assert((0 until 256).map(b => math.abs(G711.ulawToLinear(b))).max == 32124)
  }

  test("expression path decodes inside codegen") {
    val wav = companded(testSamples, AudioFormat.Encoding.ULAW)
    val r = Seq(Tuple1(wav)).toDF("payload")
      .select(G711.g711_stats(col("payload")).as("st"))
      .select("st.codec", "st.n_frames").head()
    assert(r.getInt(0) == 7 && r.getLong(1) == testSamples.length)
  }

  test("subset boundaries return null, never misread") {
    val wav = companded(testSamples, AudioFormat.Encoding.ULAW)
    // 16-bit PCM WAV rejected here (that is WavPcm's subset)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(pcmStream(testSamples, 8000f),
      AudioFileFormat.Type.WAVE, bos)
    assert(G711.parse(bos.toByteArray) == null)
    // truncated data
    assert(G711.parse(wav.dropRight(40)) == null)
    // wrong magic
    val bad = wav.clone(); bad(0) = 'X'.toByte
    assert(G711.parse(bad) == null)
    assert(G711.parse(null) == null)
  }
}
