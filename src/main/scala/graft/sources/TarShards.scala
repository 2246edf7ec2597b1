package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** F19: tar-shard (WebDataset-style) source/sink — the layout large
  * multimodal training corpora actually ship in: samples packed as
  * members of plain POSIX ustar archives ("shards"), one sample =
  * the members sharing a key prefix (`<key>.<ext>`), shards streamed
  * sequentially and sharded for parallelism (Webdataset: github.com/
  * webdataset — the FORMAT is just tar, which is what this
  * implements; no library involved).
  *
  * House ustar codec, format-real: 512-byte headers with the spec's
  * space-padded octal numerics and header CHECKSUM (verified on read,
  * computed on write), `ustar` magic, prefix-field long names, GNU
  * 'L' long-name entries honored on read, and PAX 'x' (per-member) /
  * 'g' (global) extended headers honored on read with POSIX
  * precedence (x over g over the ustar fields) for the `path` and
  * `size` keys — the two GNU/bsdtar emit by default for long names
  * and large members; base-256 (>8 GiB) sizes and non-regular member
  * types reject LOUDLY rather than misread (stated subset —
  * directories and the trailing zero blocks are skipped as the
  * format requires).
  *
  * Scale shape: READ parallelizes shard-at-a-time (the WebDataset
  * contract — shard count IS the parallelism knob), each task
  * streaming its archive through the Hadoop FileSystem API (works on
  * HDFS/S3, not just local disk) with O(member) memory; WRITE emits
  * one deterministic shard per partition (mtime 0, fixed mode —
  * byte-stable output).
  */
object TarShards {

  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  private val Block = 512

  // ─────────────────────────── writer ───────────────────────────

  private def octal(v: Long, width: Int): Array[Byte] = {
    // spec form: zero-padded octal, NUL terminator
    val s = java.lang.Long.toOctalString(v)
    require(s.length < width, s"value $v overflows a $width-char octal field")
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes(US_ASCII)
  }

  /** One ustar header block for a regular member. */
  private[sources] def header(name: String, size: Long,
                              typeflag: Byte = '0'): Array[Byte] = {
    require(name.getBytes(US_ASCII).length <= 100,
      s"member name over 100 bytes: $name")
    val h = new Array[Byte](Block)
    def put(at: Int, b: Array[Byte]): Unit =
      System.arraycopy(b, 0, h, at, b.length)
    put(0, name.getBytes(US_ASCII))
    put(100, octal(420, 8)) // mode 0644
    put(108, octal(0, 8)); put(116, octal(0, 8)) // uid, gid
    put(124, octal(size, 12))
    put(136, octal(0, 12)) // mtime 0: deterministic shards
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = typeflag // '0' regular file, 'x' PAX extended header
    put(257, "ustar\u0000".getBytes(US_ASCII))
    put(263, "00".getBytes(US_ASCII))
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    // checksum: 6 octal digits, NUL, space
    val cs = java.lang.Long.toOctalString(sum)
    put(148, (("0" * (6 - cs.length)) + cs + "\u0000 ").getBytes(US_ASCII))
    h
  }

  /** One PAX record: `"<len> <key>=<value>\n"`, len fixed-point over
    * its own decimal digits (POSIX.1-2001).
    */
  private def paxRecord(key: String, value: String): Array[Byte] = {
    val body = s" $key=$value\n"
    var len = body.length + 1
    while (len.toString.length + body.length != len)
      len = len.toString.length + body.length
    (len.toString + body).getBytes(US_ASCII)
  }

  /** Write `df` (columns `name` STRING, `payload` BINARY) as one
    * `part-NNNNN.tar` per partition under `dir`. Names over the ustar
    * field's 100 bytes are emitted through a PAX 'x' extended header
    * carrying the full `path` (r10 — what GNU/bsdtar do by default),
    * with the ustar field holding the truncated prefix for
    * PAX-unaware listings.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    root.getFileSystem(conf.value).mkdirs(root)
    df.select("name", "payload").rdd.mapPartitionsWithIndex { (idx, rows) =>
      val p = new Path(dir, f"part-$idx%05d.tar")
      val out = new java.io.BufferedOutputStream(
        p.getFileSystem(conf.value).create(p, true))
      def padTo(block: Int): Unit =
        if (block > 0) out.write(new Array[Byte](block))
      var n = 0L
      rows.foreach { r =>
        val name = r.getString(0)
        val payload = r.getAs[Array[Byte]](1)
        val long = name.getBytes(US_ASCII).length > 100
        if (long) {
          // PAX 'x' member applying to the next file (the GNU/bsdtar
          // PaxHeaders convention for its own name)
          val pax = paxRecord("path", name)
          out.write(header(
            ("PaxHeaders/" + name).take(100), pax.length, 'x'))
          out.write(pax)
          padTo((Block - pax.length % Block) % Block)
        }
        out.write(header(if (long) name.take(100) else name, payload.length))
        out.write(payload)
        padTo((Block - payload.length % Block) % Block)
        n += 1
      }
      out.write(new Array[Byte](2 * Block)) // end-of-archive
      out.close()
      Iterator.single(n)
    }.count(): Unit
  }

  // ─────────────────────────── reader ───────────────────────────

  private def parseOctal(h: Array[Byte], at: Int, len: Int): Long = {
    require((h(at) & 0x80) == 0,
      "base-256 tar numeric (member over 8 GiB) not in subset")
    var v = 0L
    var i = at
    val end = at + len
    while (i < end && (h(i) == ' ' || h(i) == 0)) i += 1
    while (i < end && h(i) >= '0' && h(i) <= '7') {
      v = (v << 3) + (h(i) - '0'); i += 1
    }
    v
  }

  private def str(h: Array[Byte], at: Int, len: Int): String = {
    var end = at
    while (end < at + len && h(end) != 0) end += 1
    new String(h, at, end - at, US_ASCII)
  }

  /** Parse a PAX extended-header payload: repeated
    * `"<len> <key>=<value>\n"` records where `<len>` is the DECIMAL
    * byte length of the whole record including itself, the space, and
    * the trailing newline (POSIX.1-2001 pax). Values are UTF-8.
    */
  private[sources] def parsePax(data: Array[Byte]): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var at = 0
    while (at < data.length && data(at) != 0) {
      var end = at
      while (end < data.length && data(end) != ' ') end += 1
      val len = new String(data, at, end - at, US_ASCII).toInt
      require(len > 0 && at + len <= data.length,
        s"PAX record length $len overruns the header payload")
      // record body between the space and the mandated trailing \n
      val body = new String(data, end + 1, at + len - end - 2,
        java.nio.charset.StandardCharsets.UTF_8)
      require(data(at + len - 1) == '\n', "PAX record missing newline")
      val eq = body.indexOf('=')
      require(eq > 0, s"PAX record without '=': $body")
      out(body.substring(0, eq)) = body.substring(eq + 1)
      at += len
    }
    out.toMap
  }

  /** Stream one archive's regular members as (name, payload). */
  def readTar(in: java.io.InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val din = new java.io.DataInputStream(in)
      private var nextEntry: (String, Array[Byte]) = _
      private var done = false
      private var pendingLongName: String = null
      private var pendingPax: Map[String, String] = Map.empty
      private var globalPax: Map[String, String] = Map.empty

      private def readBlock(): Array[Byte] = {
        val b = new Array[Byte](Block)
        din.readFully(b)
        b
      }

      private def advance(): Unit = {
        while (!done && nextEntry == null) {
          val h = readBlock()
          if (h.forall(_ == 0)) { done = true; return } // end blocks
          // checksum: header bytes with the chksum field read as spaces
          val stored = parseOctal(h, 148, 8)
          var sum = 0L
          var i = 0
          while (i < Block) {
            sum += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
            i += 1
          }
          require(sum == stored,
            s"tar header checksum $sum != stored $stored")
          val headerSize = parseOctal(h, 124, 12)
          val typeflag = h(156)
          // PAX precedence: per-member 'x' over global 'g' over ustar
          val pax = globalPax ++ pendingPax
          val size =
            if (typeflag == '0' || typeflag == 0)
              pax.get("size").map(_.toLong).getOrElse(headerSize)
            else headerSize
          require(size >= 0 && size <= (1L << 31),
            s"implausible member size $size")
          val rawName = {
            val prefix = str(h, 345, 155)
            val base = str(h, 0, 100)
            if (prefix.nonEmpty) prefix + "/" + base else base
          }
          val name = pax.getOrElse("path",
            if (pendingLongName != null) pendingLongName else rawName)
          val data = new Array[Byte](size.toInt)
          din.readFully(data)
          val pad = (Block - size % Block) % Block
          if (pad > 0) din.skipBytes(pad.toInt)
          typeflag match {
            case '0' | 0 => // regular file; overrides are now consumed
              pendingLongName = null; pendingPax = Map.empty
              nextEntry = (name, data)
            case 'L' => // GNU long name: data = the NEXT entry's name
              pendingLongName = {
                var end = data.length
                while (end > 0 && data(end - 1) == 0) end -= 1
                new String(data, 0, end, US_ASCII)
              }
            case 'x' => // PAX extended header: applies to the NEXT member
              pendingPax = parsePax(data)
            case 'g' => // PAX global header: applies to ALL subsequent
              globalPax = globalPax ++ parsePax(data)
            case '5' => // directory: skip (its overrides are consumed)
              pendingLongName = null; pendingPax = Map.empty
            case other =>
              throw new IllegalArgumentException(
                s"tar member type '${other.toChar}' not in subset")
          }
        }
      }

      def hasNext: Boolean = { advance(); !done && nextEntry != null }
      def next(): (String, Array[Byte]) = {
        advance()
        val e = nextEntry; nextEntry = null; e
      }
    }

  /** Read every `*.tar` under `dir`: one task per shard. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val sorted = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".tar"))
      .map(_.getPath.toString).sorted
    require(sorted.nonEmpty, s"no .tar shards under $dir")
    val rdd = spark.sparkContext
      .parallelize(sorted, math.max(1, sorted.size))
      .flatMap { shard =>
        val sp = new Path(shard)
        val in = sp.getFileSystem(conf.value).open(sp)
        var closed = false
        def closeAll(): Unit = if (!closed) { closed = true; in.close() }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeAll())
        val base = sp.getName
        val it = readTar(in)
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) closeAll()
            h
          }
          def next(): Row = {
            val (n, p) = it.next()
            Row(base, n, p)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
