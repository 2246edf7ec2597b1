package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** M7: byte-level MP3 frame-header decode. */
class Mp3HeaderSpec extends AnyFunSuite {

  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def fields(r: org.apache.spark.sql.catalyst.InternalRow) =
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3),
      r.getBoolean(4))

  test("bare MPEG-1 Layer III frame decodes bitrate, rate, and mode") {
    // FF FB: sync + MPEG1 + Layer III; 0x90: bitrate idx 9 (128), sr idx 0
    // (44100); 0xC0: mono
    val r = Mp3Header.parse(bytes("fffb90c0"))
    assert(fields(r) == (("mp3", 128, 44100, 1, false)))
    // stereo at 32 kHz, 320 kbps: idx 14 -> 0xE8
    val s = Mp3Header.parse(bytes("fffbe800"))
    assert(fields(s) == (("mp3", 320, 32000, 2, false)))
  }

  test("an ID3v2 tag is skipped by its syncsafe size") {
    val id3 = "4944330400000000000d" + "00" * 13
    val r = Mp3Header.parse(bytes(id3 + "fffb90c0"))
    assert(fields(r) == (("mp3", 128, 44100, 1, true)))
  }

  test("malformed payloads return null, never garbage") {
    assert(Mp3Header.parse(null) == null)
    assert(Mp3Header.parse(bytes("fffb90")) == null, "truncated frame")
    assert(Mp3Header.parse(bytes("fefb90c0")) == null, "bad sync")
    assert(Mp3Header.parse(bytes("fff390c0")) == null, "MPEG-2 rejected")
    assert(Mp3Header.parse(bytes("fffbf0c0")) == null, "bitrate idx 15")
    assert(Mp3Header.parse(bytes("fffb00c0")) == null, "free-format idx 0")
    assert(Mp3Header.parse(bytes("fffb9cc0")) == null, "sr idx 3 reserved")
    val id3TooBig = "4944330400000000007f" + "fffb90c0"
    assert(Mp3Header.parse(bytes(id3TooBig)) == null,
      "ID3 size past the payload")
    val id3BadSyncsafe = "49443304000000000080" + "00" * 13 + "fffb90c0"
    assert(Mp3Header.parse(bytes(id3BadSyncsafe)) == null,
      "high bit set in a syncsafe byte")
  }
}
