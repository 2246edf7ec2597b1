package graft.multimodal

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M14: the GIF LZW decoder against REAL files written by the JDK's
  * own GIF encoder (genuine LZW with growing code widths, dictionary
  * reuse, and multi-sub-block data — an external writer this module
  * shares no code with), plus direct LZW anchors and the loud subset
  * boundaries.
  */
class GifRasterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Indexed image with a deterministic 256-color palette. */
  private def jdkGif(w: Int, h: Int, idx: (Int, Int) => Int): (Array[Byte], (Int, Int, Int) => Unit => Unit, Array[(Int, Int, Int)]) = {
    val r = Array.tabulate(256)(i => ((i * 5) % 256).toByte)
    val g = Array.tabulate(256)(i => ((i * 11) % 256).toByte)
    val b = Array.tabulate(256)(i => ((i * 17) % 256).toByte)
    val cm = new IndexColorModel(8, 256, r, g, b)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, idx(x, y))
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val palette = Array.tabulate(256)(i =>
      ((i * 5) % 256, (i * 11) % 256, (i * 17) % 256))
    (bos.toByteArray, null, palette)
  }

  private def check(row: org.apache.spark.sql.catalyst.InternalRow,
      w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Unit = {
    assert(row != null, "GIF rejected")
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val hist = new Array[Long](8)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      sumR += r; sumG += g; sumB += b
      hist(math.min(7, (299 * r + 587 * g + 114 * b) / 31875)) += 1
    }
    assert(row.getInt(0) == w && row.getInt(1) == h)
    assert(row.getLong(2) == w.toLong * h)
    assert((row.getLong(3), row.getLong(4), row.getLong(5)) == ((sumR, sumG, sumB)))
    (0 until 8).foreach(i => assert(row.getLong(6 + i) == hist(i), s"bucket $i"))
  }

  test("decodes a JDK-written GIF (real LZW, repetitive content) exactly") {
    // runs of repeated indices force dictionary growth and code-width
    // increases inside the JDK's LZW encoder
    val w = 40; val h = 30
    val idx = (x: Int, y: Int) => if (x < 20) (y * 7) % 256 else (x + y) % 13
    val (bytes, _, pal) = jdkGif(w, h, idx)
    check(GifRaster.parse(bytes), w, h, (x, y) => pal(idx(x, y)))
  }

  test("a large noisy GIF exercises the full 12-bit dictionary") {
    val w = 100; val h = 80 // 8000 pixels: dictionary passes 4096 entries
    val idx = (x: Int, y: Int) => (x * 31 + y * 53 + x * y) % 256
    val (bytes, _, pal) = jdkGif(w, h, idx)
    check(GifRaster.parse(bytes), w, h, (x, y) => pal(idx(x, y)))
  }

  test("LZW anchors: clear-per-literal stream and KwKwK self-reference") {
    // hand-packed 9-bit stream (min code size 8): CLEAR, 5, CLEAR, 200, EOI
    def pack(codes: Seq[Int], width: Int): Array[Byte] = {
      val nBits = codes.length * width
      val out = new Array[Byte]((nBits + 7) / 8)
      codes.zipWithIndex.foreach { case (c, j) =>
        (0 until width).foreach { k =>
          if (((c >> k) & 1) != 0) {
            val bit = j * width + k
            out(bit >> 3) = (out(bit >> 3) | (1 << (bit & 7))).toByte
          }
        }
      }
      out
    }
    val simple = GifRaster.lzwDecode(8,
      pack(Seq(256, 5, 256, 200, 257), 9), 2)
    assert(simple != null && simple.toSeq == Seq(5.toByte, 200.toByte))
    // KwKwK: codes CLEAR, 65, 258 where 258 = (65,65) is defined BY its
    // own first use — output must be 65, 65, 65
    val kwk = GifRaster.lzwDecode(8, pack(Seq(256, 65, 258, 257), 9), 3)
    assert(kwk != null && kwk.toSeq == Seq(65.toByte, 65.toByte, 65.toByte))
    // code past the dictionary is corrupt
    assert(GifRaster.lzwDecode(8, pack(Seq(256, 65, 300, 257), 9), 3) == null)
  }

  test("expression path decodes inside codegen") {
    val (bytes, _, pal) = jdkGif(6, 4, (x, y) => (x + 6 * y) % 24)
    val r = Seq(Tuple1(bytes)).toDF("payload")
      .select(GifRaster.gif_stats(col("payload")).as("st"))
      .select("st.width", "st.height", "st.n_px").head()
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) == ((6, 4, 24L)))
  }

  test("subset boundaries return null, never misread") {
    val (good, _, _) = jdkGif(8, 8, (x, y) => (x * y) % 256)
    assert(GifRaster.parse(good.dropRight(15)) == null) // truncated
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(GifRaster.parse(bad) == null)
    assert(GifRaster.parse(null) == null)
    assert(GifRaster.parse(Array.empty[Byte]) == null)
    // bomb guard: huge declared frame in a tiny payload
    val bomb = good.clone()
    // image descriptor follows header+GCT; find 0x2C and bump its w/h
    var off = 13 + 3 * 256
    while ((bomb(off) & 0xff) == 0x21) {
      off += 2
      while (bomb(off) != 0) off += 1 + (bomb(off) & 0xff)
      off += 1
    }
    assert((bomb(off) & 0xff) == 0x2c)
    bomb(off + 5) = 0xff.toByte; bomb(off + 6) = 0xff.toByte
    bomb(off + 7) = 0xff.toByte; bomb(off + 8) = 0xff.toByte
    assert(GifRaster.parse(bomb) == null)
  }
}
