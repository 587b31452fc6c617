package graft.functions

import java.util.UUID

/** Byte/key codec core (SURVEY.md §2.7, ByteUtils.java:21-298,
  * KeySpace.scala:46-181 in the reference — reimplemented from public
  * specs, not ported).
  *
  * The reference's composite row key is [salt][keyspace][value]
  * (Key.scala:6-23): the salt spreads keys uniformly over the byte-ordered
  * key space so range partitioning balances (KeySpace.scala:36-44). Here
  * the salt is CRC-16/ANSI (aka CRC-16/ARC, reflected poly 0xA001 — a
  * public standard) over the value bytes.
  */
object ByteCodec {

  /** CRC-16/ARC ("ANSI"): init 0x0000, reflected polynomial 0xA001. */
  def crc16(bytes: Array[Byte]): Int = {
    var crc = 0x0000
    var i = 0
    while (i < bytes.length) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 1) != 0) (crc >>> 1) ^ 0xA001 else crc >>> 1
        b += 1
      }
      i += 1
    }
    crc & 0xffff
  }

  /** F4: big-endian long codec (ByteUtils.java:104-140 semantics). */
  def longToBytesBE(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((v >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  def bytesToLongBE(b: Array[Byte]): Long = {
    require(b.length >= 8, s"need 8 bytes, got ${b.length}")
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** F1: radix-10 byte-array parse (ByteUtils.java:21-47 semantics),
    * sign-aware. */
  def parseLongRadix10(s: String): Long = {
    var i = 0
    var neg = false
    if (s.nonEmpty && (s.charAt(0) == '-' || s.charAt(0) == '+')) {
      neg = s.charAt(0) == '-'; i = 1
    }
    var v = 0L
    while (i < s.length) {
      val c = s.charAt(i)
      require(c >= '0' && c <= '9', s"bad digit '$c' in \"$s\"")
      v = v * 10 + (c - '0')
      i += 1
    }
    if (neg) -v else v
  }

  /** F2: hex codec (ByteUtils.java:49-94 semantics). */
  def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  def fromHex(s: String): Array[Byte] = {
    require(s.length % 2 == 0, "odd hex length")
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** F3: UUID ⇄ 16-byte big-endian (SerdeUUID.scala:11-22 semantics). */
  def uuidToBytes(u: String): Array[Byte] = {
    val uuid = UUID.fromString(u)
    val out = new Array[Byte](16)
    System.arraycopy(longToBytesBE(uuid.getMostSignificantBits), 0, out, 0, 8)
    System.arraycopy(longToBytesBE(uuid.getLeastSignificantBits), 0, out, 8, 8)
    out
  }

  def bytesToUuid(b: Array[Byte]): String = {
    require(b.length == 16, s"need 16 bytes, got ${b.length}")
    val msb = bytesToLongBE(java.util.Arrays.copyOfRange(b, 0, 8))
    val lsb = bytesToLongBE(java.util.Arrays.copyOfRange(b, 8, 16))
    new UUID(msb, lsb).toString
  }

  /** Salted composite key [2B crc16 salt][2B keyspace][value]
    * (Key.scala:6-23 layout; salt width differs — documented design
    * choice, crc16 gives the same uniformity property). */
  def encodeKey(space: Short, value: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + value.length)
    val salt = crc16(value)
    out(0) = ((salt >>> 8) & 0xff).toByte
    out(1) = (salt & 0xff).toByte
    out(2) = ((space >>> 8) & 0xff).toByte
    out(3) = (space & 0xff).toByte
    System.arraycopy(value, 0, out, 4, value.length)
    out
  }

  def keySpaceOf(key: Array[Byte]): Short =
    (((key(2) & 0xff) << 8) | (key(3) & 0xff)).toShort

  def keyValueOf(key: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOfRange(key, 4, key.length)

  /** F7: EP pack/unpack (EP.scala:51-79 semantics): 4 bytes =
    * [version][probability×255][vendor hi][vendor lo]. */
  def packEp(version: Int, probability: Double, vendor: Int): Int = {
    val pb = math.round(probability * 255.0).toInt & 0xff
    ((version & 0xff) << 24) | (pb << 16) | (vendor & 0xffff)
  }

  def epVersion(packed: Int): Int = (packed >>> 24) & 0xff
  def epProbability(packed: Int): Double = ((packed >>> 16) & 0xff) / 255.0
  def epVendor(packed: Int): Int = packed & 0xffff

  /** F10: protobuf-style zigzag varint (public wire-format spec):
    * zigzag folds the sign into the LSB — zz = (v<<1)^(v>>63) — so
    * small magnitudes of EITHER sign encode short; then 7 data bits
    * per byte, MSB = continuation. 1–10 bytes per long; the staple
    * delta/key compression for log-structured storage. */
  def zigzagVarint(v: Long): Array[Byte] = {
    var zz = (v << 1) ^ (v >> 63)
    val out = new Array[Byte](10)
    var i = 0
    while ((zz & ~0x7fL) != 0L) {
      out(i) = ((zz & 0x7f) | 0x80).toByte
      zz >>>= 7
      i += 1
    }
    out(i) = (zz & 0x7f).toByte
    java.util.Arrays.copyOf(out, i + 1)
  }

  /** Inverse of [[zigzagVarint]]; throws on truncated input (no
    * terminating byte) rather than returning garbage. */
  def varintZigzag(b: Array[Byte]): Long = {
    var zz = 0L
    var shift = 0
    var i = 0
    var cont = true
    while (cont) {
      if (i >= b.length)
        throw new IllegalArgumentException("truncated varint")
      val x = b(i)
      zz |= (x & 0x7fL) << shift
      shift += 7
      i += 1
      cont = (x & 0x80) != 0
    }
    (zz >>> 1) ^ -(zz & 1L)
  }
}
