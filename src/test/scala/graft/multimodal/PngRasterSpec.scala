package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M12: the PNG raster decoder against REAL files written by the JDK's
  * own PNG encoder (genuine deflate streams and the encoder's own
  * filter choices — an external writer this module shares no code
  * with), a hand-built stream exercising every filter type explicitly,
  * the loud subset boundaries, and codegen-path equivalence.
  */
class PngRasterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def jdkPng(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  private def expected(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int))
      : (Long, Long, Long, Array[Long]) = {
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      sumR += r; sumG += g; sumB += b
      hist(math.min(7, (299 * r + 587 * g + 114 * b) / 31875)) += 1
    }
    (sumR, sumG, sumB, hist)
  }

  private def check(row: org.apache.spark.sql.catalyst.InternalRow,
      w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Unit = {
    assert(row != null, "PNG rejected")
    val (sumR, sumG, sumB, hist) = expected(w, h, px)
    assert(row.getInt(0) == w && row.getInt(1) == h)
    assert(row.getLong(2) == w.toLong * h)
    assert((row.getLong(3), row.getLong(4), row.getLong(5)) == ((sumR, sumG, sumB)))
    (0 until 8).foreach(i => assert(row.getLong(6 + i) == hist(i), s"bucket $i"))
  }

  test("decodes a JDK-written PNG (real deflate + filters) exactly") {
    val w = 9; val h = 6
    val px = (x: Int, y: Int) => ((x * 43) % 256, (y * 77) % 256, (x * y * 5) % 256)
    check(PngRaster.parse(jdkPng(w, h, px)), w, h, px)
  }

  test("a gradient image the encoder will filter aggressively decodes exactly") {
    // smooth gradients push real encoders to Sub/Up/Paeth filters
    val w = 32; val h = 24
    val px = (x: Int, y: Int) => (x * 8 % 256, y * 10 % 256, (x + y) * 4 % 256)
    check(PngRaster.parse(jdkPng(w, h, px)), w, h, px)
  }

  /** Hand-build a PNG with one chosen filter type per scanline and raw
    * (already-filtered) bytes deflated by the JDK — exercises each
    * reconstruction arm deterministically.
    */
  private def handPng(w: Int, h: Int, filters: Array[Int],
      raw: Array[Byte]): Array[Byte] = {
    val stride = 1 + 3 * w
    val scan = new Array[Byte](stride * h)
    for (y <- 0 until h) {
      scan(y * stride) = filters(y).toByte
      System.arraycopy(raw, y * 3 * w, scan, y * stride + 1, 3 * w)
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(scan); defl.finish()
    val comp = new Array[Byte](scan.length + 64)
    val n = defl.deflate(comp); defl.end()
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(tag.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.take(n)) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("all five filter types reconstruct per RFC 2083") {
    val w = 4; val h = 5
    // target pixels: deterministic pattern
    val rec = Array.tabulate(h, 3 * w)((y, x) => (y * 31 + x * 11) % 256)
    val filters = Array(0, 1, 2, 3, 4) // None, Sub, Up, Average, Paeth
    // forward-filter the target so reconstruction must invert each arm
    val raw = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until 3 * w) {
      val a = if (x >= 3) rec(y)(x - 3) else 0
      val b = if (y > 0) rec(y - 1)(x) else 0
      val c = if (x >= 3 && y > 0) rec(y - 1)(x - 3) else 0
      val v = filters(y) match {
        case 0 => rec(y)(x)
        case 1 => rec(y)(x) - a
        case 2 => rec(y)(x) - b
        case 3 => rec(y)(x) - (a + b) / 2
        case 4 =>
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
          val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          rec(y)(x) - pred
      }
      raw(y * 3 * w + x) = (v & 0xff).toByte
    }
    val row = PngRaster.parse(handPng(w, h, filters, raw))
    check(row, w, h, (x, y) => (rec(y)(3 * x), rec(y)(3 * x + 1), rec(y)(3 * x + 2)))
  }

  test("multiple IDAT chunks concatenate into one stream") {
    val full = jdkPng(6, 4, (x, y) => (x * 30, y * 50, 40))
    // split the single IDAT into two by re-chunking
    val row0 = PngRaster.parse(full)
    assert(row0 != null)
    // locate IDAT
    def be32(b: Array[Byte], i: Int) =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    var off = 8
    var idatOff = -1; var idatLen = -1
    while (idatOff < 0 && off + 8 <= full.length) {
      val len = be32(full, off)
      if (full(off + 4) == 'I' && full(off + 5) == 'D' &&
        full(off + 6) == 'A' && full(off + 7) == 'T') {
        idatOff = off; idatLen = len
      } else off += 12 + len
    }
    assert(idatOff > 0 && idatLen > 1)
    val data = full.slice(idatOff + 8, idatOff + 8 + idatLen)
    val (d1, d2) = data.splitAt(idatLen / 2)
    def chunk(tag: String, d: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + d.length)
      bb.putInt(d.length).put(tag.getBytes("US-ASCII")).put(d)
      bb.putInt(0) // CRC unchecked by the decoder
      bb.array()
    }
    val rebuilt = full.take(idatOff) ++ chunk("IDAT", d1) ++
      chunk("IDAT", d2) ++ full.drop(idatOff + 12 + idatLen)
    val row = PngRaster.parse(rebuilt)
    assert(row != null, "split-IDAT PNG rejected")
    (0 until 14).foreach { i =>
      assert(row.get(i, PngRaster.schema(i).dataType) ==
        row0.get(i, PngRaster.schema(i).dataType), s"field $i")
    }
  }

  test("interpreted eval and codegen agree on the expression path") {
    val bytes = jdkPng(3, 2, (x, y) => (x * 80, y * 100, 30))
    val df = Seq(Tuple1(bytes)).toDF("payload")
      .select(PngRaster.png_stats(col("payload")).as("st"))
      .select("st.width", "st.height", "st.n_px", "st.sum_r")
    val r = df.head()
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) == ((3, 2, 6L)))
    assert(r.getLong(3) == (0 + 80 + 160).toLong * 2)
  }

  test("subset boundaries return null, never misread") {
    val good = jdkPng(4, 4, (_, _) => (10, 20, 30))
    // truncated mid-IDAT: declared chunk length overruns the payload
    assert(PngRaster.parse(good.dropRight(25)) == null)
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(PngRaster.parse(bad) == null) // wrong signature
    // RGBA (color type 6): IHDR color type byte is at 8+8+9 = offset 25
    val rgba = good.clone(); rgba(25) = 6.toByte
    assert(PngRaster.parse(rgba) == null)
    // interlaced: IHDR interlace byte at offset 28
    val il = good.clone(); il(28) = 1.toByte
    assert(PngRaster.parse(il) == null)
    // decompression-bomb guard: tiny file declaring a 20000² raster
    val bomb = good.clone()
    val bb = java.nio.ByteBuffer.wrap(bomb, 16, 8)
    bb.putInt(20000).putInt(20000)
    assert(PngRaster.parse(bomb) == null)
    assert(PngRaster.parse(null) == null)
    assert(PngRaster.parse(Array.empty[Byte]) == null)
  }
}
