package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M10: the BMP raster decoder against REAL files written by the JDK's
  * own BMP encoder (javax.imageio ships with the JVM — an external
  * writer this module shares no code with), plus the loud subset
  * boundaries and codegen-path equivalence.
  */
class BmpRasterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def jdkBmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    bos.toByteArray
  }

  test("decodes a JDK-written BMP to exact channel sums and histogram") {
    val w = 7; val h = 5 // 7*3=21 bytes/row -> padded to 24: padding exercised
    val bytes = jdkBmp(w, h, (x, y) => ((x * 40) % 256, (y * 60) % 256, (x + y) % 256))
    val row = BmpRaster.parse(bytes)
    assert(row != null, "JDK BMP rejected")
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 40) % 256; val g = (y * 60) % 256; val b = (x + y) % 256
      sumR += r; sumG += g; sumB += b
      hist(math.min(7, (299 * r + 587 * g + 114 * b) / 31875)) += 1
    }
    assert(row.getInt(0) == w && row.getInt(1) == h)
    assert(row.getLong(2) == w.toLong * h)
    assert((row.getLong(3), row.getLong(4), row.getLong(5)) == ((sumR, sumG, sumB)))
    (0 until 8).foreach(i => assert(row.getLong(6 + i) == hist(i), s"bucket $i"))
  }

  test("interpreted eval and codegen agree on the expression path") {
    val bytes = jdkBmp(3, 2, (x, y) => (x * 80, y * 100, 30))
    val df = Seq(Tuple1(bytes)).toDF("payload")
      .select(BmpRaster.bmp_stats(col("payload")).as("st"))
      .select("st.width", "st.height", "st.n_px", "st.sum_r")
    val r = df.head()
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) == ((3, 2, 6L)))
    assert(r.getLong(3) == (0 + 80 + 160).toLong * 2)
  }

  test("subset boundaries return null, never misread") {
    // truncated data region
    val good = jdkBmp(4, 4, (_, _) => (10, 20, 30))
    assert(BmpRaster.parse(good.dropRight(5)) == null)
    // wrong magic
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(BmpRaster.parse(bad) == null)
    // 32bpp flagged: reject (only 24-bit BI_RGB in subset)
    val bpp = good.clone(); bpp(28) = 32.toByte
    assert(BmpRaster.parse(bpp) == null)
    // compressed flagged: reject
    val comp = good.clone(); comp(30) = 1.toByte
    assert(BmpRaster.parse(comp) == null)
    assert(BmpRaster.parse(null) == null)
  }

  test("top-down (negative height) BMPs decode with identical stats") {
    val good = jdkBmp(3, 3, (x, y) => (x * 50, y * 70, (x * y) % 256))
    val base = BmpRaster.parse(good)
    // flip the height sign in place (two's complement little-endian)
    val h = java.nio.ByteBuffer.wrap(good, 22, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hv = h.getInt(22)
    java.nio.ByteBuffer.wrap(good).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -hv)
    val flipped = BmpRaster.parse(good)
    assert(flipped != null && base != null)
    // orientation cannot change sums/histogram
    (2 until 14).foreach(i => assert(flipped.getLong(i) == base.getLong(i)))
  }
}
