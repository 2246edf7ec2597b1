package graft.multimodal

import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M15: the Netpbm P5/P6 decoder — hand-built streams with the full
  * header grammar, cross-decoder agreement with the independent BMP
  * byte path on identical pixels, codegen equivalence, and the loud
  * subset boundaries.
  */
class NetpbmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def p6(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
      header: String = ""): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val hdr = if (header.nonEmpty) header else s"P6\n$w $h\n255\n"
    bos.write(hdr.getBytes("US-ASCII"))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      bos.write(r); bos.write(g); bos.write(b)
    }
    bos.toByteArray
  }

  private def p5(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(s"P5\n$w $h\n255\n".getBytes("US-ASCII"))
    for (y <- 0 until h; x <- 0 until w) bos.write(px(x, y))
    bos.toByteArray
  }

  test("P6 decodes to exact channel sums and histogram") {
    val row = Netpbm.parse(p6(4, 3, (x, y) => (x * 60, y * 80, 250)))
    assert(row.getInt(0) == 3 && row.getInt(1) == 255)
    assert(row.getInt(2) == 4 && row.getInt(3) == 3)
    assert(row.getLong(4) == 12L)
    assert(row.getLong(5) == (0 + 60 + 120 + 180).toLong * 3) // sum_r
    assert(row.getLong(6) == (0 + 80 + 160).toLong * 4) // sum_g
    assert(row.getLong(7) == 250L * 12) // sum_b
  }

  test("P5 gray contributes equally to all three channel sums") {
    val row = Netpbm.parse(p5(5, 2, (x, y) => (x * 40 + y) % 256))
    val expected = (for (y <- 0 until 2; x <- 0 until 5)
      yield (x * 40 + y) % 256).sum.toLong
    assert(row.getInt(0) == 1)
    assert(row.getLong(5) == expected)
    assert(row.getLong(6) == expected && row.getLong(7) == expected)
  }

  test("header grammar: comments between every token, CRLF, multi-space") {
    val pxl = Array[Byte](1, 2, 3, 4, 5, 6)
    val hdr = "P6 # right after magic\n#full comment line\n  2\t# w\n 1 \r\n255\n"
    val bytes = hdr.getBytes("US-ASCII") ++ pxl
    val row = Netpbm.parse(bytes)
    assert(row != null && row.getInt(2) == 2 && row.getInt(3) == 1)
    assert(row.getLong(5) == 1L + 4) // sum_r
  }

  test("cross-decoder: P6 and the independent BMP path agree on stats") {
    val w = 6; val h = 4
    val px = (x: Int, y: Int) => ((x * 43) % 256, (y * 91) % 256, (x * y * 7) % 256)
    val pnm = Netpbm.parse(p6(w, h, px))
    // identical pixels through the JDK's own BMP encoder + BmpRaster
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val bmp = BmpRaster.parse(bos.toByteArray)
    // schema offsets: pnm has (channels, maxval) prepended
    assert(pnm.getLong(5) == bmp.getLong(3)) // sum_r
    assert(pnm.getLong(6) == bmp.getLong(4))
    assert(pnm.getLong(7) == bmp.getLong(5))
    for (i <- 0 until 8) assert(pnm.getLong(8 + i) == bmp.getLong(6 + i))
  }

  test("interpreted eval and codegen agree on the expression path") {
    val bytes = p6(3, 2, (x, y) => (x * 80, y * 100, 30))
    val df = Seq(Tuple1(bytes)).toDF("payload")
      .select(Netpbm.pnm_stats(col("payload")).as("st"))
      .select("st.channels", "st.width", "st.n_px", "st.sum_r")
    val r = df.head()
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) == ((3, 3, 6L)))
    assert(r.getLong(3) == (0 + 80 + 160).toLong * 2)
  }

  test("subset boundaries return null, never misread") {
    val good = p6(4, 4, (_, _) => (10, 20, 30))
    assert(Netpbm.parse(good.dropRight(3)) == null) // truncated samples
    assert(Netpbm.parse("P3\n1 1\n255\n".getBytes ++ Array[Byte](1)) == null) // ASCII variant
    assert(Netpbm.parse("P4\n8 1\n".getBytes ++ Array[Byte](1)) == null) // bitmap
    assert(Netpbm.parse(p6(2, 1, (_, _) => (1, 2, 3),
      header = "P6\n2 1\n65535\n")) == null) // 2-byte maxval
    assert(Netpbm.parse("P6\n0 3\n255\n".getBytes) == null) // zero width
    assert(Netpbm.parse(null) == null)
    // trailing bytes tolerated (concatenated files)
    assert(Netpbm.parse(good ++ Array[Byte](9, 9, 9)) != null)
  }
}
