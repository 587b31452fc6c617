package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the key/EP codecs (SURVEY.md §2.7).
  *
  * These are the reference's `Serde`/`KeySpace`/`EP` codec surface
  * (Serde.scala:6-13, KeySpace.scala:46-181, EP.scala:51-79) as native
  * expressions: registered in the session's FunctionRegistry so they
  * compose with the whole relational layer (`expr("graft_key_space(k)")`).
  * eval-based (CodegenFallback) — they sit in projection position on
  * key-width data, not in hot aggregation loops; promoting the key
  * codecs to `doGenCode` is a known optimization if a profile demands.
  */
object GraftExpressions {

  case class ParseLongRadix10(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.parseLongRadix10(v.asInstanceOf[UTF8String].toString)
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class UnhexLong(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.bytesToLongBE(ByteCodec.fromHex(v.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class LongBE(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.longToBytesBE(v.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class BELong(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.bytesToLongBE(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class UuidToBytes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.uuidToBytes(v.asInstanceOf[UTF8String].toString)
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class BytesToUuid(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(ByteCodec.bytesToUuid(v.asInstanceOf[Array[Byte]]))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class VarintEncode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.zigzagVarint(v.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class VarintDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.varintZigzag(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class Crc16(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.crc16(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class EncodeKey(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(space: Any, value: Any): Any =
      ByteCodec.encodeKey(space.asInstanceOf[Int].toShort,
        value.asInstanceOf[Array[Byte]])
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  case class KeySpaceOf(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.keySpaceOf(v.asInstanceOf[Array[Byte]]).toInt
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class KeyValueOf(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.keyValueOf(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class EpPack(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any, p: Any, ven: Any): Any =
      ByteCodec.packEp(v.asInstanceOf[Int], p.asInstanceOf[Double],
        ven.asInstanceOf[Int])
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression) = copy(f, s, t)
  }

  case class EpProbability(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.epProbability(v.asInstanceOf[Int])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class EpVendor(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.epVendor(v.asInstanceOf[Int])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class EpVersion(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      ByteCodec.epVersion(v.asInstanceOf[Int])
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Sequential dot product over two array<double> columns — a tight
    * compiled loop instead of per-element higher-order-function lambda
    * dispatch (the ANN hot path does O(N²/bucket) of these). Summation
    * order matches `aggregate(zip_with(...))` exactly, so results are
    * bit-identical to the declarative form and the DuckDB oracle.
    * Full `doGenCode` so the pairwise stage stays inside whole-stage
    * codegen (preference order: native Expression > UDF — SURVEY §7.3).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Euclidean norm of an array<double> column (same loop shape). */
  case class VecNorm(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var s = 0.0
      var i = 0
      while (i < x.numElements()) { val v = x.getDouble(i); s += v * v; i += 1 }
      math.sqrt(s)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = $a.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** MinHash signature from a pre-hashed shingle array: for each of
    * `numHashes` derived hash functions h_i = (h0·(2i+1) + i·999983)
    * mod P, the min over the array — one compiled loop per row instead
    * of numHashes interpreted lambda sweeps. Arithmetic matches the
    * DuckDB oracle's group-min formulation exactly. */
  case class MinHashSig(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    private val P = 1000000007L
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(arr: Any, n: Any): Any = {
      val harr = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val num = n.asInstanceOf[Int]
      val out = new Array[Long](num)
      var i = 0
      while (i < num) {
        var mn = Long.MaxValue
        var j = 0
        while (j < harr.numElements()) {
          val h = (harr.getLong(j) * (2 * i + 1) + i * 999983L) % P
          if (h < mn) mn = h
          j += 1
        }
        out(i) = mn
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Sign-LSH bucket id: for each of `planes` pseudo-random ±1
    * hyperplanes (weight(p,j) from ((p·2654435761 + j·40503) >> 7) & 1),
    * the sign of the dot product contributes one bucket bit. One pass
    * over the vector per row — replaces a double-explode + two
    * aggregations. Same arithmetic as the DuckDB oracle. */
  case class LshBucket(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(arr: Any, p: Any): Any = {
      val e = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val planes = p.asInstanceOf[Int]
      var bucket = 0L
      var pi = 0
      while (pi < planes) {
        var dot = 0.0
        var j = 0
        while (j < e.numElements()) {
          val w = if ((((pi * 2654435761L + j * 40503L) >> 7) & 1L) == 1L) 1.0 else -1.0
          dot += w * e.getDouble(j)
          j += 1
        }
        if (dot > 0) bucket |= 1L << pi
        pi += 1
      }
      bucket
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Sign-LSH bucket with a plane-index offset: same arithmetic as
    * [[LshBucket]] but hyperplane ids run offset..offset+planes-1, so a
    * multi-band scheme (band b → offset b·planes) gets independent
    * hyperplane sets per band. A pair is a candidate if it collides in
    * ANY band — the MinHash-LSH band construction applied to sign-LSH,
    * which is what keeps recall high at moderate cosine. */
  case class LshBucketAt(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(arr: Any, p: Any, off: Any): Any = {
      val e = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val planes = p.asInstanceOf[Int]
      val offset = off.asInstanceOf[Int]
      var bucket = 0L
      var pi = 0
      while (pi < planes) {
        val gp = offset + pi
        var dot = 0.0
        var j = 0
        while (j < e.numElements()) {
          val w = if ((((gp * 2654435761L + j * 40503L) >> 7) & 1L) == 1L) 1.0 else -1.0
          dot += w * e.getDouble(j)
          j += 1
        }
        if (dot > 0) bucket |= 1L << pi
        pi += 1
      }
      bucket
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression) = copy(f, s, t)
  }

  /** SimHash signature over an array of word hashes: bit b of the
    * result is set when Σ over words of ±1 (by bit b of the word hash)
    * is positive. `bits` ≤ 63. One pass per row. */
  case class SimHashSig(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(arr: Any, b: Any): Any = {
      val hs = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val bits = b.asInstanceOf[Int]
      var sig = 0L
      var bit = 0
      while (bit < bits) {
        var v = 0L
        var j = 0
        while (j < hs.numElements()) {
          v += (if (((hs.getLong(j) >> bit) & 1L) == 1L) 1L else -1L)
          j += 1
        }
        if (v > 0) sig |= 1L << bit
        bit += 1
      }
      sig
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sig" -> (e => MinHashSig(e(0), e(1))),
    "graft_lsh_bucket"  -> (e => LshBucket(e(0), e(1))),
    "graft_lsh_bucket_at" -> (e => LshBucketAt(e(0), e(1), e(2))),
    "graft_simhash_sig" -> (e => SimHashSig(e(0), e(1))),
    "graft_dot"        -> (e => DotProduct(e(0), e(1))),
    "graft_vec_norm"   -> (e => VecNorm(e.head)),
    "graft_parse_long" -> (e => ParseLongRadix10(e.head)),
    "graft_unhex_long" -> (e => UnhexLong(e.head)),
    "graft_long_be"    -> (e => LongBE(e.head)),
    "graft_be_long"    -> (e => BELong(e.head)),
    "graft_uuid_bytes" -> (e => UuidToBytes(e.head)),
    "graft_bytes_uuid" -> (e => BytesToUuid(e.head)),
    "graft_crc16"      -> (e => Crc16(e.head)),
    "graft_varint"     -> (e => VarintEncode(e.head)),
    "graft_unvarint"   -> (e => VarintDecode(e.head)),
    "graft_encode_key" -> (e => EncodeKey(e(0), e(1))),
    "graft_key_space"  -> (e => KeySpaceOf(e.head)),
    "graft_key_value"  -> (e => KeyValueOf(e.head)),
    "graft_ep_pack"    -> (e => EpPack(e(0), e(1), e(2))),
    "graft_ep_prob"    -> (e => EpProbability(e.head)),
    "graft_ep_vendor"  -> (e => EpVendor(e.head)),
    "graft_ep_version" -> (e => EpVersion(e.head))
  )

  /** Register all codec functions in the session (idempotent). */
  def register(spark: SparkSession): Unit = builders.foreach { case (name, b) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, b, "scala_udf")
  }
}
