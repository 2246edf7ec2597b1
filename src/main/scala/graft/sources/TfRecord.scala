package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** F20: TFRecord source/sink — the TensorFlow training-data container
  * (public format, tensorflow.org: each record is an 8-byte LE length,
  * a 4-byte MASKED CRC-32C of the length bytes, the payload, and a
  * 4-byte masked CRC-32C of the payload; the mask is the snappy/TF
  * rotation `((crc >>> 15) | (crc << 17)) + 0xa282ead8`). Both CRCs
  * verify on read — a flipped bit anywhere in a shard is a loud error,
  * never a silently corrupt sample.
  *
  * Compressed shards (r10): TF tooling writes GZIP/ZLIB-compressed
  * TFRecords by default in many pipelines
  * (`TFRecordOptions(compression_type="GZIP")`) — the compression
  * wraps the WHOLE stream and the record framing (and both CRCs) live
  * on the DECOMPRESSED bytes. Codec is chosen explicitly or by the
  * `.tfrecord.gz` extension the writer emits — never sniffed from
  * payload bytes (a raw record length can begin with the gzip magic).
  *
  * Scale shape: the WebDataset posture (F19) — shard-parallel reads
  * over the Hadoop FileSystem API (shard count is the parallelism
  * knob; TFRecord has no sync markers — and a compressed stream has no
  * seekable blocks — so intra-file splits are impossible BY FORMAT,
  * stated), one deterministic shard per partition on write, O(record)
  * memory.
  */
object TfRecord {

  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Masked CRC-32C per the TFRecord spec. */
  def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** Supported whole-stream codecs; the TF options values. */
  private val Codecs = Set("", "GZIP", "ZLIB")

  private def extension(codec: String): String = codec match {
    case "" => ".tfrecord"
    case "GZIP" => ".tfrecord.gz"
    case "ZLIB" => ".tfrecord.z"
  }

  private def wrapOut(out: java.io.OutputStream, codec: String): java.io.OutputStream =
    codec match {
      case "" => out
      case "GZIP" => new java.util.zip.GZIPOutputStream(out, 64 * 1024)
      case "ZLIB" => new java.util.zip.DeflaterOutputStream(out,
        new java.util.zip.Deflater(), 64 * 1024)
    }

  private def wrapIn(in: java.io.InputStream, codec: String): java.io.InputStream =
    codec match {
      case "" => in
      case "GZIP" => new java.util.zip.GZIPInputStream(in, 64 * 1024)
      case "ZLIB" => new java.util.zip.InflaterInputStream(in,
        new java.util.zip.Inflater(), 64 * 1024)
    }

  /** Codec for a shard path: by the extension the writer emits. A bare
    * `.tfrecord` is raw — TF itself never sniffs either (its reader
    * takes compression_type as an option).
    */
  private def codecOf(name: String): String =
    if (name.endsWith(".tfrecord.gz")) "GZIP"
    else if (name.endsWith(".tfrecord.z")) "ZLIB"
    else ""

  /** Write `df`'s `payload` BINARY column as one `part-NNNNN.tfrecord`
    * (or `.tfrecord.gz` / `.tfrecord.z` when `codec` is GZIP / ZLIB —
    * the TFRecordOptions values) per partition under `dir`.
    */
  def write(df: DataFrame, dir: String, codec: String = ""): Unit = {
    require(Codecs.contains(codec), s"tfrecord codec must be one of $Codecs")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    root.getFileSystem(conf.value).mkdirs(root)
    df.select("payload").rdd.mapPartitionsWithIndex { (idx, rows) =>
      val p = new Path(dir, f"part-$idx%05d${extension(codec)}")
      val out = new java.io.BufferedOutputStream(wrapOut(
        p.getFileSystem(conf.value).create(p, true), codec))
      var n = 0L
      rows.foreach { r =>
        val payload = r.getAs[Array[Byte]](0)
        val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          .putLong(payload.length.toLong).array()
        val lenCrc = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(maskedCrc(len, 0, 8)).array()
        val dataCrc = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(maskedCrc(payload, 0, payload.length)).array()
        out.write(len); out.write(lenCrc)
        out.write(payload); out.write(dataCrc)
        n += 1
      }
      out.close()
      Iterator.single(n)
    }.count(): Unit
  }

  /** Stream one shard's records; both CRCs verified per record. */
  def readShard(in: java.io.InputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val din = new java.io.DataInputStream(in)
      private var nextRec: Array[Byte] = _
      private var done = false
      private def advance(): Unit = {
        if (done || nextRec != null) return
        val head = new Array[Byte](12)
        val first = din.read(head, 0, 1)
        if (first < 0) { done = true; return }
        din.readFully(head, 1, 11)
        val buf = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
        val len = buf.getLong
        val lenCrc = buf.getInt
        require(maskedCrc(head, 0, 8) == lenCrc,
          "tfrecord length CRC mismatch")
        require(len >= 0 && len <= (1L << 31), s"implausible record size $len")
        val payload = new Array[Byte](len.toInt)
        din.readFully(payload)
        val tail = new Array[Byte](4)
        din.readFully(tail)
        val dataCrc = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN).getInt
        require(maskedCrc(payload, 0, payload.length) == dataCrc,
          "tfrecord payload CRC mismatch")
        nextRec = payload
      }
      def hasNext: Boolean = { advance(); !done }
      def next(): Array[Byte] = { advance(); val r = nextRec; nextRec = null; r }
    }

  /** Read every `*.tfrecord` / `*.tfrecord.gz` / `*.tfrecord.z` under
    * `dir`: one task per shard; `idx` is the record's position within
    * its shard. Codec is per-shard by extension, so mixed directories
    * read correctly; CRC verification happens on the DECOMPRESSED
    * framing (the decompressor sits between the file and the record
    * parser).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val sorted = fs.listStatus(root).toSeq
      .filter(s => s.isFile && (s.getPath.getName.endsWith(".tfrecord") ||
        s.getPath.getName.endsWith(".tfrecord.gz") ||
        s.getPath.getName.endsWith(".tfrecord.z")))
      .map(_.getPath.toString).sorted
    require(sorted.nonEmpty, s"no .tfrecord shards under $dir")
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
        val recs = readShard(wrapIn(in, codecOf(base)))
        var i = -1L
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = recs.hasNext
            if (!h) closeAll()
            h
          }
          def next(): Row = { i += 1; Row(base, i, recs.next()) }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
