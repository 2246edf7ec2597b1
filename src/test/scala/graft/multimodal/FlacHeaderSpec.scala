package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class FlacHeaderSpec extends AnyFunSuite {

  /** Build a fLaC container with the given STREAMINFO fields. */
  private def flac(sr: Int, channels: Int, bps: Int, nSamples: Long,
                   blockType: Int = 0, blockLen: Int = 34): Array[Byte] = {
    val packed = (sr.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | nSamples
    val out = new Array[Byte](8 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = blockType.toByte
    out(5) = ((blockLen >> 16) & 0xff).toByte
    out(6) = ((blockLen >> 8) & 0xff).toByte
    out(7) = (blockLen & 0xff).toByte
    // min/max block size 4096
    out(8) = 0x10; out(9) = 0; out(10) = 0x10; out(11) = 0
    for (i <- 0 until 8)
      out(18 + i) = ((packed >> (56 - 8 * i)) & 0xff).toByte
    out
  }

  private def parse(b: Array[Byte]) = Option(FlacHeader.parse(b))

  test("decodes rate, channels, bit depth, and the 36-bit sample count") {
    val row = parse(flac(96000, 2, 24, 123456789L)).get
    assert(row.getUTF8String(0).toString == "flac")
    assert(row.getInt(1) == 96000)
    assert(row.getInt(2) == 2)
    assert(row.getInt(3) == 24)
    assert(row.getLong(4) == 123456789L)
  }

  test("boundary fields: 8 channels, 32-bit depth, huge sample count") {
    val row = parse(flac(44100, 8, 32, (1L << 36) - 1)).get
    assert(row.getInt(2) == 8 && row.getInt(3) == 32)
    assert(row.getLong(4) == (1L << 36) - 1)
  }

  test("malformed payloads return NULL") {
    assert(parse(null).isEmpty)
    assert(parse(Array.emptyByteArray).isEmpty)
    assert(parse(flac(44100, 2, 16, 1L).take(20)).isEmpty)  // truncated
    val badMagic = flac(44100, 2, 16, 1L); badMagic(0) = 'g'
    assert(parse(badMagic).isEmpty)
    // first block not STREAMINFO (type 4 = VORBIS_COMMENT)
    assert(parse(flac(44100, 2, 16, 1L, blockType = 4)).isEmpty)
    // wrong STREAMINFO length
    assert(parse(flac(44100, 2, 16, 1L, blockLen = 20)).isEmpty)
    // spec-invalid sample rate 0
    assert(parse(flac(0, 2, 16, 1L)).isEmpty)
  }

  test("last-block flag on a STREAMINFO block still decodes") {
    // bit 7 set + type 0: valid (STREAMINFO may be the only block)
    assert(parse(flac(48000, 1, 16, 42L, blockType = 0x80)).isEmpty == false)
  }
}
