package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property tests for the key/value codec expressions
  * (functions/GraftExpressions.scala) on random + edge inputs, driven
  * through DataFrame projections so what is exercised is exactly the
  * expression evaluation path queries use — not a Scala-side shadow
  * implementation.
  */
class CodecPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  graft.functions.GraftExpressions.register(spark)

  private val edgeLongs = Seq(0L, 1L, -1L, 255L, 256L, -256L,
    Int.MaxValue.toLong, Int.MaxValue + 1L, Long.MaxValue, Long.MinValue)
  private def randomLongs(seed: Long, n: Int): Seq[Long] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(r.nextLong())
  }

  test("long codecs roundtrip on random and edge inputs") {
    val xs = (edgeLongs ++ randomLongs(42L, 300)).distinct
    val bad = xs.toDF("x")
      .selectExpr("x",
        "graft_be_long(graft_long_be(x)) AS be",
        "graft_parse_long(CAST(x AS STRING)) AS dec",
        "graft_unhex_long(lpad(lower(hex(x)), 16, '0')) AS hx",
        "CAST(length(graft_long_be(x)) AS BIGINT) AS w")
      .filter("be <> x OR dec <> x OR hx <> x OR w <> 8")
      .collect()
    assert(bad.isEmpty, s"codec roundtrip failed for: ${bad.mkString(", ")}")
  }

  test("zigzag varint roundtrips on random and edge inputs, with the " +
    "arithmetic byte-length law") {
    val xs = (edgeLongs ++ randomLongs(99L, 300)).distinct
    val bad = xs.toDF("x")
      .selectExpr("x", "graft_unvarint(graft_varint(x)) AS back",
        "CAST(length(graft_varint(x)) AS BIGINT) AS w")
      .filter("back <> x OR w < 1 OR w > 10")
      .collect()
    assert(bad.isEmpty, s"varint roundtrip failed: ${bad.mkString(", ")}")
    // the byte-length law the f10 oracle relies on — exactly
    // ceil(bits(zigzag)/7), min 1 — checked with exact bit arithmetic
    xs.foreach { x =>
      val zz = (x << 1) ^ (x >> 63)
      val expected =
        math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(zz) + 6) / 7)
      assert(graft.functions.ByteCodec.zigzagVarint(x).length === expected,
        s"length law broken for $x")
    }
  }

  test("uuid codec roundtrips on random uuids") {
    val r = new scala.util.Random(7L)
    val uuids = Seq.fill(100)(
      new java.util.UUID(r.nextLong(), r.nextLong()).toString)
    val bad = uuids.toDF("u")
      .selectExpr("u", "graft_bytes_uuid(graft_uuid_bytes(u)) AS back",
        "CAST(length(graft_uuid_bytes(u)) AS BIGINT) AS w")
      .filter("back <> u OR w <> 16").collect()
    assert(bad.isEmpty, s"uuid roundtrip failed for: ${bad.mkString(", ")}")
  }

  test("encode_key preserves keyspace and value for random spaces") {
    val r = new scala.util.Random(11L)
    val rows = Seq.fill(200)((r.nextInt(Short.MaxValue + 1), r.nextLong()))
    val bad = rows.toDF("s", "x")
      .selectExpr("s", "x",
        "CAST(graft_key_space(graft_encode_key(s, graft_long_be(x))) AS INT) AS s2",
        "graft_be_long(graft_key_value(graft_encode_key(s, graft_long_be(x)))) AS x2")
      .filter("s2 <> s OR x2 <> x").collect()
    assert(bad.isEmpty, s"key codec failed for: ${bad.mkString(", ")}")
  }

  test("big-endian byte order equals numeric order for non-negative longs") {
    val xs = (randomLongs(13L, 200).map(_ & Long.MaxValue) ++
      Seq(0L, 1L, Long.MaxValue)).distinct
    val bytes = xs.toDF("x")
      .selectExpr("x", "graft_long_be(x) AS b")
      .as[(Long, Array[Byte])].collect()
    val byNum = bytes.sortBy(_._1).map(_._1).toSeq
    val byBytes = bytes
      .sortWith((a, b) => java.util.Arrays.compareUnsigned(a._2, b._2) < 0)
      .map(_._1).toSeq
    assert(byBytes === byNum)
    // and Spark's own BinaryType ordering agrees (what range scans use)
    val sparkOrder = bytes.toSeq.toDF("x", "b").orderBy($"b")
      .select($"x").as[Long].collect().toSeq
    assert(sparkOrder === byNum)
  }

  test("crc16 is deterministic and stays within 16 bits") {
    val xs = randomLongs(17L, 200)
    val got = xs.toDF("x")
      .selectExpr("CAST(graft_crc16(graft_long_be(x)) AS BIGINT) AS c",
        "CAST(graft_crc16(graft_long_be(x)) AS BIGINT) AS c2")
      .as[(Long, Long)].collect()
    assert(got.forall { case (c, c2) => c == c2 && c >= 0 && c <= 65535 })
  }
}
