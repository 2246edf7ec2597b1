package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M16: the baseline JPEG decoder — real-Huffman validation against
  * files the JDK's OWN encoder writes (and its own decoder reads: each
  * conforming IDCT deviates up to ±1/pixel from the reference DCT, so
  * two decoders compare within ±2/pixel on sums), DC-only exactness,
  * the 4:4:4 color arm, restart markers, codegen equivalence, and the
  * loud subset boundaries.
  */
class JpegRasterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def jdkJpeg(img: BufferedImage, quality: Float = 0.9f): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def gray(w: Int, h: Int, px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(x, y) & 0xff
      img.getRaster.setSample(x, y, 0, v)
    }
    img
  }

  test("JDK-encoded grayscale gradient: dims exact, sums within IDCT tolerance") {
    val w = 24; val h = 16
    val img = gray(w, h, (x, y) => (x * 10 + y * 6) % 256)
    val bytes = jdkJpeg(img)
    val row = JpegRaster.parse(bytes)
    assert(row != null, "JDK grayscale JPEG must be inside the subset")
    assert(row.getInt(0) == 1 && row.getInt(1) == w && row.getInt(2) == h)
    assert(row.getLong(3) == w.toLong * h)
    // reference sums from the JDK's own DECODER on the same bytes
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += ref.getRaster.getSample(x, y, 0)
    // two conforming decoders each deviate up to +/-1/px from the
    // reference DCT (ISO 10918-2), so they may differ by +/-2/px
    assert(math.abs(row.getLong(4) - sum) <= 2L * w * h,
      s"sum_r ${row.getLong(4)} vs JDK $sum beyond +/-2/pixel")
    assert(row.getLong(5) == row.getLong(4) && row.getLong(6) == row.getLong(4))
  }

  test("non-multiple-of-8 dimensions decode with edge blocks cropped") {
    val w = 13; val h = 6
    val bytes = jdkJpeg(gray(w, h, (x, y) => 40 + x * 8 + y * 12))
    val row = JpegRaster.parse(bytes)
    assert(row != null && row.getInt(1) == w && row.getInt(2) == h)
    assert(row.getLong(3) == w.toLong * h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += ref.getRaster.getSample(x, y, 0)
    assert(math.abs(row.getLong(4) - sum) <= 2L * w * h)
  }

  test("low quality exercises dense AC runs and byte stuffing") {
    val w = 64; val h = 48
    val img = gray(w, h, (x, y) => ((x * y * 37) ^ (x * 91 + y * 53)) % 256)
    val bytes = jdkJpeg(img, quality = 0.35f)
    // entropy data of a noisy image at this size essentially always
    // carries 0xFF00 stuffing; verify the fixture really exercises it
    val hasStuffing = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0x00)
    assert(hasStuffing, "fixture lost its stuffed bytes — resize it")
    val row = JpegRaster.parse(bytes)
    assert(row != null && row.getLong(3) == w.toLong * h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += ref.getRaster.getSample(x, y, 0)
    assert(math.abs(row.getLong(4) - sum) <= 2L * w * h)
  }

  // --- hand-built DC-only streams (the gate fixture shape) ---

  private def dcOnly(bw: Int, bh: Int, diffs: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def hexw(s: String): Unit =
      bos.write(s.grouped(2).map(Integer.parseInt(_, 16)).toArray.map(_.toByte))
    hexw("FFD8")
    hexw("FFDB004300" + "08" + "10" * 63)
    hexw("FFC0000B08")
    hexw(f"${bh * 8}%04X" + f"${bw * 8}%04X")
    hexw("01011100")
    hexw("FFC40014" + "00" + "0001" + "00" * 14 + "06")
    hexw("FFC40014" + "10" + "00" * 7 + "01" + "00" * 8 + "00")
    hexw("FFDA00080101" + "0000" + "3F00")
    diffs.foreach { d =>
      val v = if (d >= 0) d else d + 63
      bos.write(v); bos.write(0)
    }
    hexw("FFD9")
    bos.toByteArray
  }

  test("DC-only stream decodes to the exact closed-form blocks") {
    // dc chain: +40, -40, +35 -> blocks flat at 168, 128, 163
    val bytes = dcOnly(3, 1, Seq(40, -40, 35))
    val row = JpegRaster.parse(bytes)
    assert(row != null)
    assert(row.getInt(1) == 24 && row.getInt(2) == 8)
    assert(row.getLong(4) == 64L * (168 + 128 + 163))
    // luma 1000*v: buckets 168->5, 128->4, 163->5
    assert(row.getLong(7 + 4) == 64L && row.getLong(7 + 5) == 128L)
  }

  test("restart markers reset the DC predictor and byte-align") {
    // DRI=2: blocks 0,1 then RST0 then blocks 2,3. After reset the
    // predictor is 0, so diff 3 = +45 is ABSOLUTE again.
    val withRst = {
      val bos = new ByteArrayOutputStream()
      def hexw(s: String): Unit =
        bos.write(s.grouped(2).map(Integer.parseInt(_, 16)).toArray.map(_.toByte))
      hexw("FFD8")
      hexw("FFDB004300" + "08" + "10" * 63)
      hexw("FFC0000B08" + "0008" + "0020" + "01011100") // 4x1 blocks
      hexw("FFC40014" + "00" + "0001" + "00" * 14 + "06")
      hexw("FFC40014" + "10" + "00" * 7 + "01" + "00" * 8 + "00")
      hexw("FFDD0004" + "0002")
      hexw("FFDA00080101" + "0000" + "3F00")
      Seq(40, -40).foreach { d => bos.write(if (d >= 0) d else d + 63); bos.write(0) }
      hexw("FFD0")
      Seq(45, -45).foreach { d => bos.write(if (d >= 0) d else d + 63); bos.write(0) }
      hexw("FFD9")
      bos.toByteArray
    }
    val row = JpegRaster.parse(withRst)
    assert(row != null)
    assert(row.getLong(4) == 64L * (168 + 128 + 173 + 128))
  }

  test("hand-built 4:4:4 color stream exercises the YCbCr->RGB arm exactly") {
    val bos = new ByteArrayOutputStream()
    def hexw(s: String): Unit =
      bos.write(s.grouped(2).map(Integer.parseInt(_, 16)).toArray.map(_.toByte))
    hexw("FFD8")
    hexw("FFDB004300" + "08" + "10" * 63)
    // SOF0: 8x8, 3 components, all 1x1 sampling, all quant table 0
    hexw("FFC00011" + "08" + "0008" + "0008" + "03" +
      "011100" + "021100" + "031100")
    hexw("FFC40014" + "00" + "0001" + "00" * 14 + "06")
    hexw("FFC40014" + "10" + "00" * 7 + "01" + "00" * 8 + "00")
    hexw("FFDA000C" + "03" + "0100" + "0200" + "0300" + "00" + "3F" + "00")
    // one MCU: Y diff +40 -> 168; Cb +40 -> 168; Cr -40 -> 88
    Seq(40, 40, -40).foreach { d =>
      bos.write(if (d >= 0) d else d + 63); bos.write(0)
    }
    hexw("FFD9")
    val row = JpegRaster.parse(bos.toByteArray)
    assert(row != null && row.getInt(0) == 3)
    // R = round(168 + 1.402*(-40)) = 112, G = round(168 - 0.344136*40
    // + 0.714136*40) = 183, B = round(168 + 1.772*40) = 239
    assert(row.getLong(4) == 64L * 112)
    assert(row.getLong(5) == 64L * 183)
    assert(row.getLong(6) == 64L * 239)
  }

  // hand-built 4:2:0 color stream: luma 2x2 sampling, chroma 1x1,
  // DC-only blocks (exact closed form, q0 = 8 so value = 128 + diff)
  private def handJpeg420(wPx: Int, hPx: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def hexw(s: String): Unit =
      bos.write(s.grouped(2).map(Integer.parseInt(_, 16)).toArray.map(_.toByte))
    hexw("FFD8")
    hexw("FFDB004300" + "08" + "10" * 63)
    // SOF0: 3 components, luma 2x2, chroma 1x1 — 4:2:0
    hexw("FFC00011" + "08" + f"$hPx%04X" + f"$wPx%04X" + "03" +
      "012200" + "021100" + "031100")
    hexw("FFC40014" + "00" + "0001" + "00" * 14 + "06")
    hexw("FFC40014" + "10" + "00" * 7 + "01" + "00" * 8 + "00")
    hexw("FFDA000C" + "03" + "0100" + "0200" + "0300" + "00" + "3F" + "00")
    // one MCU: 4 luma blocks (diff chain +40,-40,+40,-40 ->
    // 168,128,168,128 quadrants), Cb +40 -> 168, Cr -40 -> 88
    Seq(40, -40, 40, -40, 40, -40).foreach { d =>
      bos.write(if (d >= 0) d else d + 63); bos.write(0)
    }
    hexw("FFD9")
    bos.toByteArray
  }

  // closed-form RGB for (Y, cb=168, cr=88)
  private def rgb420(yv: Int): (Long, Long, Long) = (
    math.round(yv + 1.402 * (88 - 128)),
    math.round(yv - 0.344136 * (168 - 128) - 0.714136 * (88 - 128)),
    math.round(yv + 1.772 * (168 - 128)))

  test("hand-built 4:2:0 stream: quadrant luma + constant chroma, exact") {
    val row = JpegRaster.parse(handJpeg420(16, 16))
    assert(row != null && row.getInt(0) == 3)
    assert(row.getInt(1) == 16 && row.getInt(2) == 16)
    val (rA, gA, bA) = rgb420(168)
    val (rB, gB, bB) = rgb420(128)
    assert(row.getLong(4) == 128 * rA + 128 * rB)
    assert(row.getLong(5) == 128 * gA + 128 * gB)
    assert(row.getLong(6) == 128 * bA + 128 * bB)
  }

  test("4:2:0 edge cropping counts only in-bounds pixels per luma block") {
    // 12x12 inside a single 16x16 MCU: TL block contributes 8x8 = 64 px
    // (Y=168), TR 4x8 = 32 (Y=128), BL 8x4 = 32 (Y=168), BR 4x4 = 16
    // (Y=128) — block PLACEMENT matters here, not just totals
    val row = JpegRaster.parse(handJpeg420(12, 12))
    assert(row != null && row.getLong(3) == 144L)
    val (rA, _, _) = rgb420(168)
    val (rB, _, _) = rgb420(128)
    assert(row.getLong(4) == 96 * rA + 48 * rB)
  }

  private def sofSampling(bytes: Array[Byte]): Int = {
    // first luma H/V nibble byte inside SOF0 (skip to marker 0xC0)
    var i = 2
    while (!((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0))
      i += 1
    bytes(i + 11) & 0xff
  }

  test("JDK-encoded 4:2:0 color JPEG with constant chroma matches the JDK decoder") {
    // gray-content RGB image: Cb = Cr = 128 everywhere, so the
    // upsampling filter choice (our nearest vs the JDK's fancy) cannot
    // differ — only the ISO IDCT bound separates two decoders
    val w = 32; val h = 24
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 11) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = jdkJpeg(img)
    assert(sofSampling(bytes) == 0x22,
      "fixture must actually be 4:2:0 (JDK default for color)")
    val row = JpegRaster.parse(bytes)
    assert(row != null && row.getInt(0) == 3)
    assert(row.getInt(1) == w && row.getInt(2) == h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sR = 0L; var sG = 0L; var sB = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      sR += (p >> 16) & 0xff; sG += (p >> 8) & 0xff; sB += p & 0xff
    }
    val n = w.toLong * h
    assert(math.abs(row.getLong(4) - sR) <= 2 * n)
    assert(math.abs(row.getLong(5) - sG) <= 2 * n)
    assert(math.abs(row.getLong(6) - sB) <= 2 * n)
  }

  test("JDK-encoded constant-color 4:2:0 decodes to the flat color") {
    val w = 16; val h = 16
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (200 << 16) | (80 << 8) | 40)
    val bytes = jdkJpeg(img)
    assert(sofSampling(bytes) == 0x22)
    val row = JpegRaster.parse(bytes)
    assert(row != null)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val p = ref.getRGB(3, 3)
    val n = w.toLong * h
    assert(math.abs(row.getLong(4) - n * ((p >> 16) & 0xff)) <= 2 * n)
    assert(math.abs(row.getLong(5) - n * ((p >> 8) & 0xff)) <= 2 * n)
    assert(math.abs(row.getLong(6) - n * (p & 0xff)) <= 2 * n)
  }

  // progressive (SOF2) arm (r9): the JDK encoder's default progression
  // script runs DC-first + DC-refine + spectral-selection AC scans +
  // AC successive-approximation refinements — the full G.1 surface
  private def jdkProgressive(img: BufferedImage,
                             quality: Float = 0.9f): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def isProgressive(bytes: Array[Byte]): Boolean =
    bytes.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) > 0

  test("JDK progressive grayscale matches the JDK decoder within the bound") {
    val w = 40; val h = 24
    val img = gray(w, h, (x, y) => (x * 11 + y * 7 + (x * y) % 13) % 256)
    val bytes = jdkProgressive(img)
    assert(isProgressive(bytes), "fixture must actually be SOF2")
    val row = JpegRaster.parse(bytes)
    assert(row != null, "progressive grayscale must decode")
    assert(row.getInt(1) == w && row.getInt(2) == h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += ref.getRaster.getSample(x, y, 0)
    assert(math.abs(row.getLong(4) - sum) <= 2L * w * h,
      s"progressive sum ${row.getLong(4)} vs JDK $sum beyond +/-2/px")
  }

  test("JDK progressive 4:2:0 color matches the JDK decoder (constant chroma)") {
    val w = 32; val h = 32
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5 + y * 9) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = jdkProgressive(img)
    assert(isProgressive(bytes))
    val row = JpegRaster.parse(bytes)
    assert(row != null, "progressive 4:2:0 must decode")
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sR = 0L; var sG = 0L; var sB = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      sR += (p >> 16) & 0xff; sG += (p >> 8) & 0xff; sB += p & 0xff
    }
    val n = w.toLong * h
    assert(math.abs(row.getLong(4) - sR) <= 2 * n)
    assert(math.abs(row.getLong(5) - sG) <= 2 * n)
    assert(math.abs(row.getLong(6) - sB) <= 2 * n)
  }

  test("progressive low quality exercises EOB runs and deep refinements") {
    val w = 48; val h = 32
    val img = gray(w, h, (x, y) =>
      if ((x / 8 + y / 8) % 2 == 0) 230 else (x * 3 + y * 5) % 256)
    val bytes = jdkProgressive(img, quality = 0.25f)
    assert(isProgressive(bytes))
    val row = JpegRaster.parse(bytes)
    assert(row != null)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += ref.getRaster.getSample(x, y, 0)
    assert(math.abs(row.getLong(4) - sum) <= 2L * w * h)
  }

  test("interpreted eval and codegen agree on the expression path") {
    val bytes = dcOnly(1, 1, Seq(40))
    val df = Seq(Tuple1(bytes)).toDF("payload")
      .select(JpegRaster.jpeg_stats(col("payload")).as("st"))
      .select("st.channels", "st.width", "st.n_px", "st.sum_r")
    val r = df.head()
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) == ((1, 8, 64L)))
    assert(r.getLong(3) == 64L * 168)
  }

  test("fill bytes and TEM in the marker walk are legal (B.1.1.2)") {
    val img = gray(16, 8, (x, y) => (x * 9 + y * 5) % 256)
    val bytes = jdkJpeg(img)
    val base = JpegRaster.parse(bytes)
    assert(base != null)
    // 0xFF fill-byte run before a marker: splice FF FF after SOI so the
    // next segment reads as <fill><fill><real marker>
    val fill = Array[Byte](0xff.toByte, 0xff.toByte)
    val filled = bytes.take(2) ++ fill ++ bytes.drop(2)
    val f = JpegRaster.parse(filled)
    assert(f != null, "fill bytes before a marker must not reject")
    assert(f.getLong(4) == base.getLong(4))
    // TEM (0xFF01) is standalone and length-less — must skip cleanly
    val tem = bytes.take(2) ++
      Array[Byte](0xff.toByte, 0x01.toByte) ++ bytes.drop(2)
    val t = JpegRaster.parse(tem)
    assert(t != null, "TEM marker must not be parsed as length-bearing")
    assert(t.getLong(4) == base.getLong(4))
  }

  test("subset boundaries return null, never misread") {
    val good = dcOnly(2, 1, Seq(40, -40))
    // progressive flagged (SOF2)
    val prog = good.clone()
    val sofAt = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegRaster.parse(prog) == null)
    // sampling factor beyond 2 flagged (3x1 luma)
    val sub = good.clone(); sub(sofAt + 12) = 0x31.toByte
    assert(JpegRaster.parse(sub) == null)
    // subsampled CHROMA flagged (luma 2x2 + chroma 2x2 is out of subset)
    val badChroma = handJpeg420(16, 16)
    val sof420 = badChroma.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    badChroma(sof420 + 14) = 0x22.toByte // component 2 H/V
    assert(JpegRaster.parse(badChroma) == null)
    // 16-bit quant table flagged
    val dqtAt = good.indexOfSlice(Seq(0xff.toByte, 0xdb.toByte))
    val q16 = good.clone(); q16(dqtAt + 4) = 0x10.toByte
    assert(JpegRaster.parse(q16) == null)
    // truncated entropy data
    assert(JpegRaster.parse(good.dropRight(4)) == null)
    assert(JpegRaster.parse(null) == null)
    assert(JpegRaster.parse(Array[Byte](1, 2, 3)) == null)
  }
}
