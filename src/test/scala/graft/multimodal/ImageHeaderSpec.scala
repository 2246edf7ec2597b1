package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImageHeaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // minimal real headers: PNG 3×2, GIF 5×4, BMP 7×6, JPEG (SOF0) 9×8
  val png = hexBytes("89504E470D0A1A0A 0000000D 49484452 00000003 00000002 08 06 000000")
  val gif = hexBytes("474946383961 0500 0400 00 00 00")
  val bmp = hexBytes("424D 46000000 00000000 36000000 28000000 07000000 06000000 0100")
  // SOI, APP0 (len 16), SOF0: len 11, prec 8, height 8, width 9, 1 comp
  val jpeg = hexBytes("FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 00 00" +
    " FFC0 000B 08 0008 0009 01 01 1100")

  test("parses png/gif/bmp/jpeg dimensions; rejects garbage") {
    val rows = Seq(
      (1L, png), (2L, gif), (3L, bmp), (4L, jpeg),
      (5L, "not an image".getBytes("UTF-8")), (6L, Array.empty[Byte]))
      .toDF("id", "payload")
      .select(col("id"), ImageHeader.image_meta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .as[(Long, Option[String], Option[Int], Option[Int])]
      .collect().map { case (k, v1, v2, v3) => k -> ((v1, v2, v3)) }.toMap
    assert(rows(1L) == ((Some("png"), Some(3), Some(2))))
    assert(rows(2L) == ((Some("gif"), Some(5), Some(4))))
    assert(rows(3L) == ((Some("bmp"), Some(7), Some(6))))
    assert(rows(4L) == ((Some("jpeg"), Some(9), Some(8))))
    assert(rows(5L)._1.isEmpty && rows(6L)._1.isEmpty)
  }

  test("wav header parses channels/rate/bits; chunk walk skips LIST") {
    // RIFF, then a 4-byte LIST chunk BEFORE fmt: the walk must skip it
    val wav = hexBytes("52494646 24000000 57415645" +
      " 4C495354 04000000 41424344" +                       // LIST chunk (skipped)
      " 666d7420 10000000 0100 0200 803E0000 00FA0000 0400 1000")
    val got = Seq((1L, wav), (2L, "RIFFnope".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"), AudioHeader.audio_meta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.channels"),
        col("m.sample_rate"), col("m.bits_per_sample"))
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Int])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some("wav"), Some(2), Some(16000), Some(16))))
    assert(got(2L)._1.isEmpty)
  }

  test("non-nullable binary input still yields null for garbage (nullable contract)") {
    // lit() binary is non-nullable: without `override nullable = true` the
    // planner marks the struct non-nullable and codegen breaks
    val df = spark.range(1).select(
      ImageHeader.image_meta(lit("not an image".getBytes("UTF-8"))).as("m"),
      AudioHeader.audio_meta(lit("not audio".getBytes("UTF-8"))).as("a"))
    val r = df.select(col("m").isNull, col("a").isNull).as[(Boolean, Boolean)].head()
    assert(r == ((true, true)))
  }

  test("BITMAPCOREHEADER (OS/2 BMP) is rejected, not misread") {
    // 'BM' + file header, DIB size 12 (core header: u16 w/h) — the u32
    // reader at offsets 18/22 would decode garbage dims
    val core = hexBytes("424D 1A000000 00000000 1A000000 0C000000 0700 0600 0100 0100")
    val got = Seq((1L, core)).toDF("id", "p")
      .select(ImageHeader.image_meta(col("p")).isNull).as[Boolean].head()
    assert(got)
  }

  test("top-down BMP (negative height) reports absolute height") {
    val topDown = bmp.clone()
    // height at offset 22, little-endian: -6
    val neg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-6).array()
    System.arraycopy(neg, 0, topDown, 22, 4)
    val got = Seq((1L, topDown)).toDF("id", "payload")
      .select(ImageHeader.image_meta(col("payload")).as("m"))
      .select(col("m.height")).as[Int].head()
    assert(got == 6)
  }
}
