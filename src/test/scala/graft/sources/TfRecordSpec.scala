package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F20: the TFRecord codec — masked-CRC golden behavior, byte-layout
  * pinning, corruption detection, and shard-parallel round-trips.
  */
class TfRecordSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("tf_spec").toString

  test("masked CRC matches the spec transform of plain CRC-32C") {
    val data = "level".getBytes(UTF_8)
    val c = new java.util.zip.CRC32C
    c.update(data)
    val crc = c.getValue.toInt
    val expected = ((crc >>> 15) | (crc << 17)) + 0xa282ead8
    assert(TfRecord.maskedCrc(data, 0, data.length) == expected)
    // the mask is not the identity (a raw CRC would pass a naive check)
    assert(TfRecord.maskedCrc(data, 0, data.length) != crc)
  }

  test("record layout: 8B LE length + masked len-CRC + payload + masked data-CRC") {
    val dir = tmp()
    TfRecord.write(Seq(Tuple1("abc".getBytes(UTF_8))).toDF("payload")
      .coalesce(1), dir)
    val f = Files.list(Paths.get(dir)).iterator().asScala
      .find(f => f.getFileName.toString.startsWith("part-") &&
        !f.getFileName.toString.endsWith(".crc")).get
    val b = Files.readAllBytes(f)
    assert(b.length == 8 + 4 + 3 + 4)
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getLong(0) == 3L)
    assert(new String(b, 12, 3, UTF_8) == "abc")
    assert(buf.getInt(8) == TfRecord.maskedCrc(b, 0, 8))
    assert(buf.getInt(15) == TfRecord.maskedCrc("abc".getBytes(UTF_8), 0, 3))
  }

  test("round-trip preserves every record in shard order") {
    val dir = tmp()
    val payloads = (0 until 50).map(i => s"rec-$i-${"x" * (i % 13)}")
    TfRecord.write(payloads.map(p => Tuple1(p.getBytes(UTF_8)))
      .toDF("payload").coalesce(1), dir)
    val back = TfRecord.read(spark, dir)
      .orderBy("idx")
      .select(decode(col("payload"), "UTF-8"))
      .as[String].collect().toSeq
    assert(back == payloads)
  }

  test("a flipped bit in length, payload, or CRC fields is loud") {
    val dir = tmp()
    TfRecord.write(Seq(Tuple1("sensitive-training-sample".getBytes(UTF_8)))
      .toDF("payload").coalesce(1), dir)
    val f = Files.list(Paths.get(dir)).iterator().asScala
      .find(f => f.getFileName.toString.startsWith("part-") &&
        !f.getFileName.toString.endsWith(".crc")).get
    val good = Files.readAllBytes(f)
    for (at <- Seq(0, 9, 14, good.length - 1)) {
      val bad = good.clone(); bad(at) = (bad(at) ^ 0x01).toByte
      val e = intercept[IllegalArgumentException] {
        TfRecord.readShard(new java.io.ByteArrayInputStream(bad)).toList
      }
      assert(e.getMessage.contains("CRC") || e.getMessage.contains("size"),
        s"byte $at: ${e.getMessage}")
    }
  }

  test("multi-shard read parallelizes per shard") {
    val dir = tmp()
    TfRecord.write((0L until 40L).toDF("k")
      .select(encode(concat(lit("p"), col("k")), "UTF-8").as("payload"))
      .repartition(4), dir)
    val back = TfRecord.read(spark, dir)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 40L)
    assert(back.select("shard").distinct().count() == 4L)
  }

  test("GZIP shards round-trip; CRCs verify on the DECOMPRESSED framing (r10)") {
    val dir = tmp()
    val payloads = (0 until 30).map(i => s"gz-rec-$i-${"y" * (i % 7)}")
    TfRecord.write(payloads.map(p => Tuple1(p.getBytes(UTF_8)))
      .toDF("payload").coalesce(1), dir, codec = "GZIP")
    val f = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".tfrecord.gz")).get
    // the shard IS a gzip stream (magic 1f 8b)...
    val raw = Files.readAllBytes(f)
    assert((raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
    // ...and the DECOMPRESSED bytes are plain TFRecord framing: the
    // raw readShard parses them, which places the CRC check after the
    // decompressor, not on the compressed bytes
    val plain = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    val recs = TfRecord.readShard(plain).map(new String(_, UTF_8)).toSeq
    assert(recs == payloads)
    // engine read path decodes by extension
    val back = TfRecord.read(spark, dir)
      .orderBy("idx").select(decode(col("payload"), "UTF-8"))
      .as[String].collect().toSeq
    assert(back == payloads)
    // a flipped bit in the decompressed framing is still loud
    val goodPlain = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw))
      in.readAllBytes()
    }
    val bad = goodPlain.clone(); bad(13) = (bad(13) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      TfRecord.readShard(new java.io.ByteArrayInputStream(bad)).toList
    }
    assert(e.getMessage.contains("CRC"))
  }

  test("ZLIB shards round-trip and mixed codec directories read per-shard (r10)") {
    val dir = tmp()
    TfRecord.write(Seq(Tuple1("zlib-rec".getBytes(UTF_8))).toDF("payload")
      .coalesce(1), dir, codec = "ZLIB")
    // drop a RAW shard beside it: codec resolves per-shard by extension
    TfRecord.write(Seq(Tuple1("raw-rec".getBytes(UTF_8))).toDF("payload")
      .coalesce(1), dir)
    val back = TfRecord.read(spark, dir)
      .select(decode(col("payload"), "UTF-8")).as[String].collect().toSet
    assert(back == Set("zlib-rec", "raw-rec"))
    // the .z shard is a zlib stream (0x78 header byte)
    val zf = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".tfrecord.z")).get
    assert((Files.readAllBytes(zf)(0) & 0xff) == 0x78)
  }
}
