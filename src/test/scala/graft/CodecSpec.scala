package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ByteCodec

/** Golden-byte codec tests (KeyTest.scala:7-60 / SerdeTest.scala:12-31
  * genre in the reference: exact expected bytes, round trips, ordering).
  */
class CodecSpec extends AnyFunSuite {

  test("crc16 matches the CRC-16/ARC public check value") {
    // standard check input "123456789" → 0xBB3D for CRC-16/ARC
    assert(ByteCodec.crc16("123456789".getBytes("ASCII")) === 0xBB3D)
    assert(ByteCodec.crc16(Array.emptyByteArray) === 0x0000)
  }

  test("big-endian long codec: golden bytes and round trip") {
    assert(ByteCodec.longToBytesBE(1L).toSeq ===
      Seq[Byte](0, 0, 0, 0, 0, 0, 0, 1))
    assert(ByteCodec.longToBytesBE(0x0102030405060708L).toSeq ===
      Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    assert(ByteCodec.longToBytesBE(-1L).toSeq === Seq.fill(8)((-1).toByte))
    for (v <- Seq(0L, 42L, -42L, Long.MaxValue, Long.MinValue, 1234567890123L))
      assert(ByteCodec.bytesToLongBE(ByteCodec.longToBytesBE(v)) === v)
  }

  test("radix-10 parse: signs and round trip") {
    assert(ByteCodec.parseLongRadix10("0") === 0L)
    assert(ByteCodec.parseLongRadix10("-123") === -123L)
    assert(ByteCodec.parseLongRadix10("+987654321") === 987654321L)
    intercept[IllegalArgumentException](ByteCodec.parseLongRadix10("12x"))
  }

  test("hex codec round trip and golden") {
    assert(ByteCodec.toHex(Array[Byte](0, 15, -1)) === "000fff")
    assert(ByteCodec.fromHex("000fff").toSeq === Seq[Byte](0, 15, -1))
    val b = Array.tabulate[Byte](32)(i => (i * 7 - 100).toByte)
    assert(ByteCodec.fromHex(ByteCodec.toHex(b)).toSeq === b.toSeq)
  }

  test("UUID codec: 16-byte width, round trip, golden bytes") {
    // the reference's own test UUID (KeyTest.scala fixtures)
    val u = "f81d4fae-7dec-11d0-a765-00a0c91e6bf6"
    val b = ByteCodec.uuidToBytes(u)
    assert(b.length === 16)
    assert(b.take(4).toSeq === Seq[Byte](-8, 29, 79, -82))
    assert(ByteCodec.bytesToUuid(b) === u)
  }

  test("salted composite key: layout, extraction, round trip") {
    val value = ByteCodec.longToBytesBE(123456789L)
    val k = ByteCodec.encodeKey(7, value)
    assert(k.length === 4 + 8)
    assert(ByteCodec.keySpaceOf(k) === 7)
    assert(ByteCodec.keyValueOf(k).toSeq === value.toSeq)
    // salt is the crc16 of the value bytes, stored big-endian in bytes 0-1
    val salt = ByteCodec.crc16(value)
    assert(((k(0) & 0xff) << 8 | (k(1) & 0xff)) === salt)
  }

  test("EP pack/unpack: quantization and field extraction") {
    val p = ByteCodec.packEp(1, 0.5, 0xABCD)
    assert(ByteCodec.epVersion(p) === 1)
    assert(ByteCodec.epVendor(p) === 0xABCD)
    assert(ByteCodec.epProbability(p) === 128.0 / 255.0) // round(0.5*255)=128
    assert(ByteCodec.epProbability(ByteCodec.packEp(1, 1.0, 0)) === 1.0)
    assert(ByteCodec.epProbability(ByteCodec.packEp(1, 0.0, 0)) === 0.0)
  }

  test("zigzag varint: protobuf golden vectors, lengths, round trip") {
    def enc(v: Long) = ByteCodec.zigzagVarint(v).map(_ & 0xff).toSeq
    // the protobuf wire-format spec's published zigzag examples
    assert(enc(0L) === Seq(0x00))
    assert(enc(-1L) === Seq(0x01))
    assert(enc(1L) === Seq(0x02))
    assert(enc(-2L) === Seq(0x03))
    assert(enc(63L) === Seq(0x7e))
    assert(enc(-64L) === Seq(0x7f))
    assert(enc(64L) === Seq(0x80, 0x01)) // first 2-byte value
    assert(enc(300L) === Seq(0xd8, 0x04))
    assert(ByteCodec.zigzagVarint(Long.MaxValue).length === 10)
    assert(ByteCodec.zigzagVarint(Long.MinValue).length === 10)
    for (v <- Seq(0L, 1L, -1L, 63L, 64L, -65L, 300L, 1234567890123L,
        -987654321098L, Long.MaxValue, Long.MinValue))
      assert(ByteCodec.varintZigzag(ByteCodec.zigzagVarint(v)) === v)
    // truncated input fails fast rather than decoding garbage
    intercept[IllegalArgumentException] {
      ByteCodec.varintZigzag(Array(0x80.toByte))
    }
  }

  test("unsigned lexicographic byte order == numeric order for non-negatives") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(1000)(rnd.nextLong().abs)
    val cmp = new java.util.Comparator[Array[Byte]] {
      def compare(a: Array[Byte], b: Array[Byte]): Int =
        java.util.Arrays.compareUnsigned(a, b)
    }
    val byBytes = vals.map(ByteCodec.longToBytesBE)
      .sortWith((a, b) => cmp.compare(a, b) < 0)
      .map(ByteCodec.bytesToLongBE)
    assert(byBytes === vals.sorted)
  }
}
