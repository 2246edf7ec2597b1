package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** M17: the TIFF decoder — EXACT round-trips against the JDK's own
  * TIFF encoder (uncompressed TIFF is lossless, so unlike JPEG there
  * is no tolerance band), both byte orders, multi-strip assembly,
  * WhiteIsZero inversion, codegen equivalence, and the loud subset
  * boundaries.
  */
class TiffRasterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def jdkTiff(img: BufferedImage, compression: String = null,
                      tile: Option[(Int, Int)] = None): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = w.getDefaultWriteParam
    if (compression == null)
      // uncompressed: the JDK TIFF plugin has no "None" type name
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    else {
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(compression)
    }
    tile.foreach { case (tw, th) =>
      p.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setTiling(tw, th, 0, 0)
    }
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  test("JDK-encoded RGB TIFF round-trips to exact channel sums") {
    val w = 9; val h = 7
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var eR = 0L; var eG = 0L; var eB = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ((x * 29) % 256, (y * 61) % 256, (x * y * 11) % 256)
      eR += r; eG += g; eB += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val row = TiffRaster.parse(jdkTiff(img))
    assert(row != null, "JDK uncompressed RGB TIFF must be in the subset")
    assert(row.getInt(0) == 3 && row.getInt(1) == w && row.getInt(2) == h)
    assert((row.getLong(4), row.getLong(5), row.getLong(6)) == ((eR, eG, eB)))
  }

  test("JDK-encoded grayscale TIFF round-trips exactly") {
    val w = 6; val h = 5
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    var exp = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 37 + y * 19) % 256
      exp += v
      img.getRaster.setSample(x, y, 0, v)
    }
    val row = TiffRaster.parse(jdkTiff(img))
    assert(row != null && row.getInt(0) == 1)
    assert(row.getLong(4) == exp && row.getLong(5) == exp && row.getLong(6) == exp)
  }

  // hand-built fixture: gray, optionally big-endian / multi-strip /
  // WhiteIsZero — the arms the JDK encoder won't necessarily produce
  private def handTiff(w: Int, h: Int, px: Int => Int, bigEndian: Boolean,
      rowsPerStrip: Int, photometric: Int = 1): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { bos.write(v >> 8); bos.write(v & 0xff) }
      else { bos.write(v & 0xff); bos.write(v >> 8) }
    def w32(v: Int): Unit =
      if (bigEndian) { bos.write(v >>> 24); bos.write((v >> 16) & 0xff)
        bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
      else { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write(v >>> 24) }
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val nEntries = 9
    // entry value arrays (strip offsets/counts) live after the IFD
    val ifdEnd = 8 + 2 + nEntries * 12 + 4
    val arrBytes = if (nStrips > 1) nStrips * 8 else 0
    val dataAt = ifdEnd + arrBytes
    bos.write(if (bigEndian) 'M' else 'I'); bos.write(if (bigEndian) 'M' else 'I')
    w16(42); w32(8)
    w16(nEntries)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      w16(tag); w16(typ); w32(cnt)
      if (typ == 3 && cnt == 1) {
        // SHORT inline: left-justified in file byte order
        if (bigEndian) { w16(v); w16(0) } else { w16(v); w16(0) }
      } else w32(v)
    }
    val stripBytes = (0 until nStrips).map(s =>
      w * math.min(rowsPerStrip, h - s * rowsPerStrip))
    entry(256, 3, 1, w); entry(257, 3, 1, h)
    entry(258, 3, 1, 8); entry(259, 3, 1, 1)
    entry(262, 3, 1, photometric)
    if (nStrips == 1) entry(273, 4, 1, dataAt)
    else entry(273, 4, nStrips, ifdEnd)
    entry(277, 3, 1, 1); entry(278, 3, 1, rowsPerStrip)
    if (nStrips == 1) entry(279, 4, 1, stripBytes.head)
    else entry(279, 4, nStrips, ifdEnd + nStrips * 4)
    w32(0) // next IFD
    if (nStrips > 1) {
      var off = dataAt
      stripBytes.foreach { sb => w32(off); off += sb }
      stripBytes.foreach(w32)
    }
    for (p <- 0 until w * h) bos.write(px(p))
    bos.toByteArray
  }

  // planar-configuration-2 RGB fixture (little-endian): per-channel
  // strips plane-major, optional per-plane predictor-2 differencing;
  // `planes` < 3 under-supplies the region arrays (boundary test)
  private def planarStripTiff(w: Int, h: Int, px: (Int, Int, Int) => Int,
      rps: Int, usePredictor: Boolean = false, planes: Int = 3): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    val nBands = (h + rps - 1) / rps
    val n = if (usePredictor) 11 else 10
    val ifdEnd = 8 + 2 + n * 12 + 4
    val bitsAt = ifdEnd
    val offsAt = bitsAt + 6
    val cntsAt = offsAt + planes * nBands * 4
    val dataAt = cntsAt + planes * nBands * 4
    bos.write('I'); bos.write('I'); w16(42); w32(8)
    w16(n)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      w16(tag); w16(typ); w32(cnt)
      if (typ == 3 && cnt == 1) { w16(v); w16(0) } else w32(v)
    }
    entry(256, 3, 1, w); entry(257, 3, 1, h)
    entry(258, 3, 3, bitsAt); entry(259, 3, 1, 1)
    entry(262, 3, 1, 2); entry(273, 4, planes * nBands, offsAt)
    entry(277, 3, 1, 3); entry(278, 3, 1, rps)
    entry(279, 4, planes * nBands, cntsAt); entry(284, 3, 1, 2)
    if (usePredictor) entry(317, 3, 1, 2)
    w32(0)
    w16(8); w16(8); w16(8)
    val bandRows = (0 until nBands).map(s => math.min(rps, h - s * rps))
    var off = dataAt
    for (_ <- 0 until planes; s <- 0 until nBands) {
      w32(off); off += w * bandRows(s)
    }
    for (_ <- 0 until planes; s <- 0 until nBands) w32(w * bandRows(s))
    for (c <- 0 until planes; s <- 0 until nBands) {
      val y0 = s * rps
      for (dy <- 0 until bandRows(s)) {
        val y = y0 + dy
        var prev = 0
        for (x <- 0 until w) {
          val v = px(c, x, y)
          if (usePredictor) { bos.write((v - prev) & 0xff); prev = v }
          else bos.write(v)
        }
      }
    }
    bos.toByteArray
  }

  // planar tiled fixture: one 16×16 tile per channel, plane-major
  private def planarTiledTiff(w: Int, h: Int,
      px: (Int, Int, Int) => Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    val n = 11
    val ifdEnd = 8 + 2 + n * 12 + 4
    val bitsAt = ifdEnd; val offsAt = bitsAt + 6
    val cntsAt = offsAt + 12; val dataAt = cntsAt + 12
    bos.write('I'); bos.write('I'); w16(42); w32(8)
    w16(n)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      w16(tag); w16(typ); w32(cnt)
      if (typ == 3 && cnt == 1) { w16(v); w16(0) } else w32(v)
    }
    entry(256, 3, 1, w); entry(257, 3, 1, h)
    entry(258, 3, 3, bitsAt); entry(259, 3, 1, 1)
    entry(262, 3, 1, 2); entry(277, 3, 1, 3)
    entry(284, 3, 1, 2)
    entry(322, 3, 1, 16); entry(323, 3, 1, 16)
    entry(324, 4, 3, offsAt); entry(325, 4, 3, cntsAt)
    w32(0)
    w16(8); w16(8); w16(8)
    (0 until 3).foreach(c => w32(dataAt + c * 256))
    (0 until 3).foreach(_ => w32(256))
    for (c <- 0 until 3; y <- 0 until 16; x <- 0 until 16)
      bos.write(if (x < w && y < h) px(c, x, y) else 0)
    bos.toByteArray
  }

  test("planar-config-2 strips decode identically to the chunky JDK encoding (r10b)") {
    val w = 7; val h = 5
    def ch(c: Int, x: Int, y: Int): Int = (x * 29 + y * 61 + c * 97) % 256
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (ch(0, x, y) << 16) | (ch(1, x, y) << 8) | ch(2, x, y))
    val chunky = TiffRaster.parse(jdkTiff(img))
    assert(chunky != null)
    // multi-band planar strips (rps=2 -> 3 bands x 3 planes = 9 strips)
    val planar = TiffRaster.parse(planarStripTiff(w, h, ch, rps = 2))
    assert(planar != null, "planar-config-2 must be in the subset now")
    assert(planar.toSeq(TiffRaster.schema) == chunky.toSeq(TiffRaster.schema),
      "separate planes must re-interleave to the chunky statistics")
    // predictor 2 differences PER PLANE (stride 1) and agrees
    val pred = TiffRaster.parse(
      planarStripTiff(w, h, ch, rps = 2, usePredictor = true))
    assert(pred != null &&
      pred.toSeq(TiffRaster.schema) == chunky.toSeq(TiffRaster.schema))
    // an under-supplied region array (1 plane's strips under tag 284=2)
    // rejects rather than misreads
    assert(TiffRaster.parse(
      planarStripTiff(w, h, ch, rps = 2, planes = 1)) == null)
  }

  test("planar-config-2 tiles decode identically to the chunky JDK encoding (r10b)") {
    val w = 6; val h = 4
    def ch(c: Int, x: Int, y: Int): Int = (x * 41 + y * 23 + c * 113) % 256
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (ch(0, x, y) << 16) | (ch(1, x, y) << 8) | ch(2, x, y))
    val chunky = TiffRaster.parse(jdkTiff(img))
    val planar = TiffRaster.parse(planarTiledTiff(w, h, ch))
    assert(planar != null)
    assert(planar.toSeq(TiffRaster.schema) == chunky.toSeq(TiffRaster.schema),
      "per-plane tiles (with padding) must re-interleave to chunky stats")
  }

  test("big-endian and little-endian fixtures agree") {
    val px = (p: Int) => (p * 41 + 3) % 256
    val a = TiffRaster.parse(handTiff(5, 4, px, bigEndian = false, 4))
    val b = TiffRaster.parse(handTiff(5, 4, px, bigEndian = true, 4))
    assert(a != null && b != null)
    for (i <- 0 until 15) assert(a.getLong(4) == b.getLong(4))
    assert(a.getLong(4) == (0 until 20).map(px(_).toLong).sum)
  }

  test("multi-strip assembly with out-of-line offset arrays") {
    val px = (p: Int) => (p * 7) % 256
    val single = TiffRaster.parse(handTiff(6, 9, px, bigEndian = false, 9))
    val striped = TiffRaster.parse(handTiff(6, 9, px, bigEndian = false, 2))
    assert(single != null && striped != null)
    assert(single.getLong(4) == striped.getLong(4))
    for (i <- 0 until 8)
      assert(single.getLong(7 + i) == striped.getLong(7 + i))
  }

  test("WhiteIsZero grayscale inverts sample values") {
    val px = (p: Int) => p % 256
    val black = TiffRaster.parse(handTiff(4, 2, px, bigEndian = false, 2,
      photometric = 1))
    val white = TiffRaster.parse(handTiff(4, 2, px, bigEndian = false, 2,
      photometric = 0))
    assert(black != null && white != null)
    assert(white.getLong(4) == 255L * 8 - black.getLong(4))
  }

  test("interpreted eval and codegen agree on the expression path") {
    val bytes = handTiff(3, 2, p => p * 30, bigEndian = false, 2)
    val df = Seq(Tuple1(bytes)).toDF("payload")
      .select(TiffRaster.tiff_stats(col("payload")).as("st"))
      .select("st.channels", "st.width", "st.n_px", "st.sum_r")
    val r = df.head()
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) == ((1, 3, 6L)))
    assert(r.getLong(3) == (0 until 6).map(_ * 30L).sum)
  }

  // compressed arms (r9): the JDK's own TIFF encoder produces each
  // regime; lossless compression means the round-trip stays EXACT
  private def compressedRoundtrip(compression: String): Unit = {
    val w = 23; val h = 11 // non-multiple sizes, runs + noise
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var eR = 0L; var eG = 0L; var eB = 0L
    for (y <- 0 until h; x <- 0 until w) {
      // long runs (RLE-friendly) mixed with varying tails
      val (r, g, b) =
        if (x < 12) (7, 200, 33)
        else ((x * 29 + y) % 256, (y * 61 + x) % 256, (x * y * 11) % 256)
      eR += r; eG += g; eB += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = jdkTiff(img, compression)
    val row = TiffRaster.parse(bytes)
    assert(row != null, s"JDK $compression TIFF must decode")
    assert(row.getInt(1) == w && row.getInt(2) == h)
    assert((row.getLong(4), row.getLong(5), row.getLong(6)) == ((eR, eG, eB)),
      s"$compression channel sums diverged")
  }

  test("JDK LZW-compressed TIFF round-trips exactly") {
    compressedRoundtrip("LZW")
  }

  test("JDK PackBits-compressed TIFF round-trips exactly") {
    compressedRoundtrip("PackBits")
  }

  test("JDK Deflate-compressed TIFF round-trips exactly") {
    compressedRoundtrip("ZLib")
    compressedRoundtrip("Deflate")
  }

  test("JDK grayscale LZW with enough pixels to grow the code table") {
    // > 4k distinct-ish pixels forces code widths past 9 bits and
    // exercises the early-change bump at 511/1023/2047
    val w = 101; val h = 53
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    var exp = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * x + y * 37 + (x * y) % 97) % 256
      exp += v
      img.getRaster.setSample(x, y, 0, v)
    }
    val row = TiffRaster.parse(jdkTiff(img, "LZW"))
    assert(row != null)
    assert(row.getLong(4) == exp)
  }

  test("JDK palette TIFF decodes through the ColorMap") {
    // indexed-color image: the JDK writes photometric 3 + ColorMap
    val pal = new Array[Int](256)
    for (i <- 0 until 256) pal(i) = (i << 16) | (((i * 7) % 256) << 8) | ((i * 13) % 256)
    val cm = new java.awt.image.IndexColorModel(8, 256,
      pal.map(p => ((p >> 16) & 0xff).toByte),
      pal.map(p => ((p >> 8) & 0xff).toByte),
      pal.map(p => (p & 0xff).toByte))
    val w = 9; val h = 6
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    var eR = 0L; var eG = 0L; var eB = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val idx = (x * 31 + y * 17) % 256
      img.getRaster.setSample(x, y, 0, idx)
      val p = pal(idx)
      eR += (p >> 16) & 0xff; eG += (p >> 8) & 0xff; eB += p & 0xff
    }
    val bytes = jdkTiff(img)
    val row = TiffRaster.parse(bytes)
    assert(row != null, "JDK palette TIFF must decode")
    assert((row.getLong(4), row.getLong(5), row.getLong(6)) == ((eR, eG, eB)))
  }

  test("missing RowsPerStrip defaults to all-rows-in-one-strip") {
    // tag 278 is optional; the spec default is effectively "one strip".
    // Overwrite the 278 entry with an ignored tag (296 ResolutionUnit)
    // so the fixture omits it — decode must match the explicit form.
    val px = (p: Int) => (p * 13 + 5) % 256
    val explicitRps = handTiff(5, 3, px, bigEndian = false, 3)
    val noRps = explicitRps.clone()
    val at278 = 8 + 2 + 7 * 12 // entry index 7 = tag 278
    noRps(at278) = (296 & 0xff).toByte; noRps(at278 + 1) = (296 >> 8).toByte
    val a = TiffRaster.parse(explicitRps)
    val b = TiffRaster.parse(noRps)
    assert(a != null && b != null,
      "single-strip TIFF without RowsPerStrip must decode")
    for (i <- 4 to 6) assert(a.getLong(i) == b.getLong(i))
  }

  test("multi-IFD (non-zero next-IFD pointer) rejects, never page-one-only") {
    val good = handTiff(4, 4, p => p, bigEndian = false, 4)
    assert(TiffRaster.parse(good) != null)
    val multi = good.clone()
    val nextIfdAt = 8 + 2 + 9 * 12
    multi(nextIfdAt) = 8.toByte // pretend a second IFD exists
    assert(TiffRaster.parse(multi) == null)
  }

  test("JDK-written TILED RGB TIFF decodes identically to the strip form (r10)") {
    // dims deliberately NOT multiples of the tile size: the right and
    // bottom tiles carry padding that must never reach the statistics
    val w = 40; val h = 35
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        (((x * 31) % 256) << 16) | (((y * 57) % 256) << 8) | ((x * y * 7) % 256))
    val strip = TiffRaster.parse(jdkTiff(img))
    val tiled = TiffRaster.parse(jdkTiff(img, tile = Some((16, 16))))
    assert(strip != null && tiled != null,
      "both organizations must be in the subset")
    val n = TiffRaster.schema.length
    assert((0 until n).map(i => tiled.get(i, TiffRaster.schema(i).dataType)) ==
      (0 until n).map(i => strip.get(i, TiffRaster.schema(i).dataType)),
      "tiled and strip decodes of the same image diverged")
  }

  test("tiled + LZW: tiles flow through the compression arms (r10)") {
    val w = 50; val h = 20
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    var exp = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 13 + y * 41) % 256
      exp += v
      img.getRaster.setSample(x, y, 0, v)
    }
    val tiled = TiffRaster.parse(jdkTiff(img, "LZW", tile = Some((32, 16))))
    assert(tiled != null)
    assert(tiled.getInt(1) == w && tiled.getInt(2) == h)
    assert(tiled.getLong(3) == w.toLong * h)
    assert(tiled.getLong(4) == exp)
  }

  test("tiled subset boundaries: non-16-multiple tiles and mixed tags reject (r10)") {
    val w = 32; val h = 32
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x + y) % 256)
    val good = jdkTiff(img, tile = Some((16, 16)))
    assert(TiffRaster.parse(good) != null)
    // corrupt a tile offset to point past the payload: loud (null)
    // locate tag 324 (TileOffsets) in the IFD and break its value
    def u16le(b: Array[Byte], i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32le(b: Array[Byte], i: Int) =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    val le = good(0) == 'I'
    if (le) { // only meaningful to patch when we know the layout
      val ifd = u32le(good, 4).toInt
      val n = u16le(good, ifd)
      val bad = good.clone()
      var e = 0
      var patched = false
      while (e < n && !patched) {
        val entry = ifd + 2 + 12 * e
        if (u16le(good, entry) == 324) {
          // value (or offset) field: point it far past the file
          bad(entry + 8) = 0xff.toByte; bad(entry + 9) = 0xff.toByte
          bad(entry + 10) = 0xff.toByte; bad(entry + 11) = 0x7f.toByte
          patched = true
        }
        e += 1
      }
      assert(patched, "fixture must contain TileOffsets")
      assert(TiffRaster.parse(bad) == null)
    }
  }

  test("subset boundaries return null, never misread") {
    val good = handTiff(4, 4, p => p, bigEndian = false, 4)
    // LZW-compressed flagged
    val lzw = good.clone()
    // compression entry value: find tag 259 (entry index 3) value bytes
    val at = 8 + 2 + 3 * 12 + 8
    lzw(at) = 5.toByte
    assert(TiffRaster.parse(lzw) == null)
    // truncated strip
    assert(TiffRaster.parse(good.dropRight(3)) == null)
    // bad magic number
    val bad = good.clone(); bad(2) = 43.toByte
    assert(TiffRaster.parse(bad) == null)
    assert(TiffRaster.parse(null) == null)
    assert(TiffRaster.parse(Array[Byte]('I', 'I', 1)) == null)
  }
}
