package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.7 scalar/codec function queries. Round-trip style: the Spark side
  * drives value → bytes → value through the custom expressions; the
  * oracle recomputes the observable output relationally (DuckDB cannot
  * run the codecs, it doesn't need to — decode(encode(x)) must equal a
  * directly-computable value).
  */
object CodecQueries {
  type Q = (SparkSession, String) => DataFrame

  private def withFns(s: SparkSession): Unit = GraftExpressions.register(s)

  val queries: Map[String, Q] = Map(
    // F1: radix-10 parse of decimal strings back to longs.
    "f1_parse_radix10" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      Tables.orders(s, d)
        .select($"o_orderkey",
          expr("graft_parse_long(CAST(o_orderkey AS STRING))").as("parsed"),
          expr("graft_parse_long(CAST(-o_orderkey AS STRING))").as("parsed_neg"))
        .orderBy($"o_orderkey")
    }),

    // F2: hex codec — 16-digit padded hex of the big-endian key, parsed
    // back via the custom expression.
    "f2_hex_roundtrip" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      Tables.orders(s, d)
        .select($"o_orderkey",
          lpad(lower(hex($"o_orderkey")), 16, "0").as("hexstr"))
        .withColumn("back", expr("graft_unhex_long(hexstr)"))
        .orderBy($"o_orderkey")
    }),

    // F3: UUID codec — md5-derived canonical UUID string ⇄ 16 bytes.
    "f3_uuid_roundtrip" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      Tables.customer(s, d)
        .withColumn("h", md5($"c_name"))
        .select($"c_custkey",
          concat_ws("-", substring($"h", 1, 8), substring($"h", 9, 4),
            substring($"h", 13, 4), substring($"h", 17, 4),
            substring($"h", 21, 12)).as("uuid_str"))
        .withColumn("back",
          expr("graft_bytes_uuid(graft_uuid_bytes(uuid_str))"))
        .orderBy($"c_custkey")
    }),

    // F4: big-endian long ⇄ 8 bytes (width + round-trip observable).
    "f4_bigendian_roundtrip" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      Tables.orders(s, d)
        .select($"o_orderkey",
          expr("graft_be_long(graft_long_be(o_orderkey))").as("back"),
          expr("CAST(length(graft_long_be(o_orderkey)) AS BIGINT)").as("width"))
        .orderBy($"o_orderkey")
    }),

    // F5: unsigned lexicographic byte order == numeric order for
    // non-negative big-endian keys (ByteUtils.java:180-197 semantics;
    // BinaryType ordering is unsigned lexicographic — SURVEY §7.4 risk 2).
    "f5_byte_order" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      import org.apache.spark.sql.expressions.Window
      // Order-parity check without a global single-task window: bin by
      // o_orderkey range (constant bin count), count adjacent byte-order
      // inversions inside each bin via a PARTITIONED window, then check
      // bin boundaries on the constant-size per-bin summary (driver
      // side, like cutoff's threshold). Zero total ⟺ unsigned-lex
      // byte order == numeric order over the whole table.
      val enc = Tables.orders(s, d)
        .select($"o_orderkey", expr("graft_long_be(o_orderkey)").as("kb"))
      val stats = enc.agg(min($"o_orderkey"), max($"o_orderkey"),
        count(lit(1))).first()
      val n = stats.getLong(2)
      if (n == 0) {
        Seq((0L, 0L)).toDF("n", "order_mismatches")
      } else {
        val (lo, hi) = (stats.getLong(0), stats.getLong(1))
        val nbins = 256L
        // no cache: binned is scanned twice (bounds + the final agg) but
        // is a cheap scan-side projection — recompute beats a leaked block
        val binned = enc.withColumn("bin",
          if (hi == lo) lit(0L)
          else least(floor(($"o_orderkey" - lo) * (nbins.toDouble / (hi - lo))),
            lit(nbins - 1)))
        val wBin = Window.partitionBy($"bin").orderBy($"o_orderkey")
        val bounds = binned.groupBy($"bin").agg(
            min_by($"kb", $"o_orderkey").as("first_kb"),
            max_by($"kb", $"o_orderkey").as("last_kb"))
          .collect()
          .map(r => (r.getLong(0), r.getAs[Array[Byte]](1),
            r.getAs[Array[Byte]](2)))
          .sortBy(_._1)
        val boundaryMm = bounds.sliding(2).count {
          case Array((_, _, lastA), (_, firstB, _)) =>
            java.util.Arrays.compareUnsigned(lastA, firstB) >= 0
          case _ => false
        }.toLong
        binned
          .withColumn("prev_kb", lag($"kb", 1).over(wBin))
          .agg(count(lit(1)).as("n"),
            (sum(when($"prev_kb".isNotNull && $"kb" <= $"prev_kb", 1L)
              .otherwise(0L)) + lit(boundaryMm)).as("order_mismatches"))
      }
    }),

    // F6: crc16-salted composite key round trip ([salt][space][value],
    // Key.scala:6-23; salt distribution is asserted in ScalaTest).
    "f6_salted_key_roundtrip" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      Tables.orders(s, d)
        .withColumn("k",
          expr("graft_encode_key(7, graft_long_be(o_orderkey))"))
        .select($"o_orderkey",
          expr("CAST(graft_key_space(k) AS BIGINT)").as("space"),
          expr("graft_be_long(graft_key_value(k))").as("back"))
        .orderBy($"o_orderkey")
    }),

    // F7: EP pack/unpack — probability quantized to /255, vendor code
    // and version preserved (EP.scala:51-79).
    "f7_ep_pack" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      Tables.lineitem(s, d)
        .withColumn("packed",
          expr("graft_ep_pack(1, l_discount, CAST(l_suppkey % 100 AS INT))"))
        .select($"l_orderkey", $"l_linenumber",
          expr("CAST(graft_ep_version(packed) AS BIGINT)").as("version"),
          expr("graft_ep_prob(packed)").as("prob_q"),
          expr("CAST(graft_ep_vendor(packed) AS BIGINT)").as("vendor"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // F8: split / mkString (README.md:148-156 spell-check idiom).
    "f8_split_join" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey",
          array_join(split($"p_name", " "), ",").as("joined"),
          size(split($"p_name", " ")).cast("long").as("n_tokens"))
        .orderBy($"p_partkey")
    }),

    // F9: keyspace string codecs (KeySpace.scala:46-115): decimal-long
    // and hex keyspaces, encode → decode = identity.
    "f9_keyspace_codecs" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      Tables.orders(s, d)
        .select($"o_orderkey",
          expr("graft_parse_long(CAST(o_orderkey AS STRING))").as("back_dec"),
          expr("graft_unhex_long(lpad(lower(hex(o_orderkey)), 16, '0'))")
            .as("back_hex"),
          expr("CAST(graft_crc16(graft_long_be(o_orderkey)) AS BIGINT) >= 0")
            .as("salt_nonneg"))
        .orderBy($"o_orderkey")
    }),

    // F10: zigzag varint codec — the delta/key compression of every
    // log-structured store (protobuf wire format, public spec).
    // Signed deltas around the key median exercise both signs; the
    // observable is the byte-LENGTH histogram plus the exact
    // round-trip count per length bucket — the oracle recomputes the
    // length arithmetically (1 byte per 7 bits of the zigzag value),
    // which is precisely what the encoder must produce.
    "f10_varint_roundtrip" -> ((s, d) => {
      import s.implicits._
      withFns(s)
      Tables.orders(s, d)
        .select(($"o_orderkey" - 3000L).as("x"))
        .withColumn("b", expr("graft_varint(x)"))
        .select($"x", length($"b").cast("long").as("n_bytes"),
          expr("graft_unvarint(b)").as("back"))
        .groupBy($"n_bytes")
        .agg(count(lit(1)).as("n"),
          sum(when($"back" === $"x", 1L).otherwise(0L)).as("n_roundtrip_ok"),
          sum($"x").as("sum_x"))
        .orderBy($"n_bytes")
    })
  )

  val oracles: Map[String, String] = Map(
    "f1_parse_radix10" ->
      """SELECT o_orderkey, o_orderkey AS parsed, -o_orderkey AS parsed_neg
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f2_hex_roundtrip" ->
      """SELECT o_orderkey, lpad(lower(to_hex(o_orderkey)), 16, '0') AS hexstr,
        |       o_orderkey AS back
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f3_uuid_roundtrip" ->
      """SELECT c_custkey,
        |       substr(md5(c_name),1,8) || '-' || substr(md5(c_name),9,4)
        |         || '-' || substr(md5(c_name),13,4) || '-'
        |         || substr(md5(c_name),17,4) || '-' || substr(md5(c_name),21,12)
        |         AS uuid_str,
        |       substr(md5(c_name),1,8) || '-' || substr(md5(c_name),9,4)
        |         || '-' || substr(md5(c_name),13,4) || '-'
        |         || substr(md5(c_name),17,4) || '-' || substr(md5(c_name),21,12)
        |         AS back
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f4_bigendian_roundtrip" ->
      """SELECT o_orderkey, o_orderkey AS back, CAST(8 AS BIGINT) AS width
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f5_byte_order" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(0 AS BIGINT) AS order_mismatches FROM orders""".stripMargin,
    "f6_salted_key_roundtrip" ->
      """SELECT o_orderkey, CAST(7 AS BIGINT) AS space, o_orderkey AS back
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f7_ep_pack" ->
      """SELECT l_orderkey, l_linenumber, CAST(1 AS BIGINT) AS version,
        |       CAST(round(l_discount*255) AS BIGINT) / 255.0 AS prob_q,
        |       l_suppkey % 100 AS vendor
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f8_split_join" ->
      """SELECT p_partkey, replace(p_name, ' ', ',') AS joined,
        |       len(string_split(p_name, ' ')) AS n_tokens
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f9_keyspace_codecs" ->
      """SELECT o_orderkey, o_orderkey AS back_dec, o_orderkey AS back_hex,
        |       true AS salt_nonneg
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f10_varint_roundtrip" ->
      """WITH v AS (SELECT o_orderkey - 3000 AS x FROM orders),
        |z AS (SELECT x, CASE WHEN x >= 0 THEN 2 * x
        |                     ELSE -2 * x - 1 END AS zz FROM v),
        |b AS (SELECT x,
        |        CASE WHEN zz < 128 THEN 1
        |             WHEN zz < 16384 THEN 2
        |             WHEN zz < 2097152 THEN 3
        |             WHEN zz < 268435456 THEN 4
        |             WHEN zz < 34359738368 THEN 5
        |             ELSE 6 END AS n_bytes
        |      FROM z)
        |SELECT CAST(n_bytes AS BIGINT) AS n_bytes,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
        |       CAST(sum(x) AS BIGINT) AS sum_x
        |FROM b GROUP BY n_bytes ORDER BY n_bytes""".stripMargin
  )
}
