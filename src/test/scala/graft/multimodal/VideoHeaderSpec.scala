package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VideoHeaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ftyp(isom) + moov{mvhd v0: timescale 600, duration 7200}
  val mp4 = hexBytes("00000010 66747970 69736f6d 00000000" +
    " 00000024 6d6f6f76 0000001c 6d766864 00000000 00000000 00000000" +
    " 00000258 00001c20")
  // same but mvhd version 1 (64-bit fields): contract rejects
  val mp4v1 = hexBytes("00000010 66747970 69736f6d 00000000" +
    " 00000024 6d6f6f76 0000001c 6d766864 01000000 00000000 00000000" +
    " 00000258 00001c20")
  // ftyp with an unrelated sibling box and NO moov
  val noMoov = hexBytes("00000010 66747970 69736f6d 00000000" +
    " 00000010 6672656520202020 41414141")

  test("parses ftyp brand + mvhd timescale/duration; rejects non-v0 and missing moov") {
    val rows = Seq((1L, mp4), (2L, mp4v1), (3L, noMoov),
      (4L, "garbage".getBytes("UTF-8"))).toDF("id", "b")
    val got = rows.select(col("id"), VideoHeader.video_meta(col("b")).as("m"))
      .select(col("id"), col("m.format"), col("m.brand"),
        col("m.timescale"), col("m.duration"))
      .as[(Long, Option[String], Option[String], Option[Int], Option[Int])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some("mp4"), Some("isom"), Some(600), Some(7200))))
    assert(got(2L) == ((None, None, None, None)))
    assert(got(3L) == ((None, None, None, None)))
    assert(got(4L) == ((None, None, None, None)))
  }

  test("a truncated/lying box size never reads out of bounds") {
    // moov claims 0x24 bytes but the payload stops short
    val torn = hexBytes("00000010 66747970 69736f6d 00000000" +
      " 00000024 6d6f6f76 0000001c 6d766864 00000000")
    val got = Seq((1L, torn)).toDF("id", "b")
      .select(VideoHeader.video_meta(col("b")).as("m")).collect().head
    assert(got.isNullAt(0))
  }

  test("adversarial sizes: mvhd ending at buffer end and near-2^31 boxes") {
    // minimal mvhd box (cs=8, no body) closing the moov exactly at the
    // buffer end: the j+28 bound must be checked BEFORE reading b(j+8)
    val tightMvhd = hexBytes("00000010 66747970 69736f6d 00000000" +
      " 00000010 6d6f6f76 00000008 6d766864")
    // top-level box claiming size 0x7ffffffc: Int cursor math would wrap
    // negative and index out of bounds; Long math rejects it
    val hugeBox = hexBytes("00000010 66747970 69736f6d 00000000" +
      " 7ffffffc 66726565 00000000")
    // size with the top bit set (unsigned 2^31+16): must also reject
    val unsignedBox = hexBytes("00000010 66747970 69736f6d 00000000" +
      " 80000010 66726565 00000000")
    val got = Seq((1L, tightMvhd), (2L, hugeBox), (3L, unsignedBox))
      .toDF("id", "b")
      .select(VideoHeader.video_meta(col("b")).as("m")).collect()
    assert(got.forall(_.isNullAt(0)), "malformed payloads must yield null, not throw")
  }

  test("sniff routes the six magic families and quarantines the rest") {
    val wav = hexBytes("52494646 00000000 57415645")
    val rows = Seq(
      (1L, hexBytes("89504e470d0a1a0a")), (2L, hexBytes("ffd8ffe0")),
      (3L, hexBytes("474946383961")), (4L, hexBytes("424d0000")),
      (5L, wav), (6L, mp4), (7L, hexBytes("deadbeef")),
      (8L, Array.empty[Byte])).toDF("id", "b")
    val got = rows.select(col("id"), Sniff.content_type(col("b")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "gif", 4L -> "bmp",
      5L -> "wav", 6L -> "mp4", 7L -> "unknown", 8L -> "unknown"))
  }
}
