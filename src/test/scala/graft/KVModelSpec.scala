package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.write.KVTable

/** Property-based model test (KeySpaceTest statistical-genre parity,
  * applied to storage semantics): random sequences of put/delete cells
  * resolved by KVTable must match a naive in-memory HBase model.
  */
class KVModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (key, family, qualifier, value|tomb, ts)
  private case class Op(key: Long, family: String, qualifier: String,
                        ts: Long, tomb: Option[String])

  private val genOp: Gen[Op] = for {
    key <- Gen.choose(0L, 4L)
    fam <- Gen.oneOf("F", "T")
    qual <- Gen.oneOf("a", "b", "c")
    ts <- Gen.choose(1L, 20L)
    tomb <- Gen.frequency(6 -> Gen.const(None),
      1 -> Gen.const(Some("cell")), 1 -> Gen.const(Some("family")),
      1 -> Gen.const(Some("row")))
  } yield Op(key, fam, qual, ts, tomb)

  /** Naive reference model of HBase latest-wins + tombstone masking. */
  private def model(ops: List[Op]): Set[(Long, String, String, String, Long)] = {
    def rowDel(k: Long) =
      ops.filter(o => o.tomb.contains("row") && o.key == k)
        .map(_.ts).maxOption.getOrElse(Long.MinValue)
    def famDel(k: Long, f: String) =
      ops.filter(o => o.tomb.contains("family") && o.key == k && o.family == f)
        .map(_.ts).maxOption.getOrElse(Long.MinValue)
    def cellDel(k: Long, f: String, q: String) =
      ops.filter(o => o.tomb.contains("cell") && o.key == k &&
          o.family == f && o.qualifier == q)
        .map(_.ts).maxOption.getOrElse(Long.MinValue)
    ops.filter(_.tomb.isEmpty)
      .groupBy(o => (o.key, o.family, o.qualifier))
      .flatMap { case ((k, f, q), cells) =>
        val latest = cells.maxBy(_.ts)
        val mask = List(rowDel(k), famDel(k, f), cellDel(k, f, q)).max
        if (latest.ts > mask)
          Some((k, f, q, s"v${latest.key}_${latest.ts}", latest.ts))
        else None
      }.toSet
  }

  test("resolve matches the naive model on random op sequences") {
    for (seed <- 1 to 8) {
      val ops = Gen.listOfN(40, genOp)
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
      // duplicate (key,fam,qual,ts) puts are ambiguous (which value wins)
      // — drop later duplicates like HBase overwrites identical ts cells
      val deduped = ops.zipWithIndex
        .groupBy(o => (o._1.key, o._1.family, o._1.qualifier, o._1.ts, o._1.tomb))
        .map(_._2.head).toList.sortBy(_._2).map(_._1)
      val t = KVTable(spark,
        targetPath(s"graft_kv_test/model_${deduped.hashCode.abs}"),
        wipe = true)
      val puts = deduped.filter(_.tomb.isEmpty)
        .map(o => (o.key, o.family, o.qualifier, s"v${o.key}_${o.ts}", o.ts))
      if (puts.nonEmpty)
        t.put(puts.toDF("key", "family", "qualifier", "value", "ts"))
      deduped.filter(_.tomb.nonEmpty).groupBy(_.ts).foreach { case (ts, dels) =>
        t.delete(dels.map {
          case Op(k, f, q, _, Some("row")) => (k, None, None)
          case Op(k, f, _, _, Some("family")) => (k, Some(f), None)
          case Op(k, f, q, _, Some("cell")) => (k, Some(f), Some(q))
          case o => throw new IllegalStateException(o.toString)
        }.toDF("key", "family", "qualifier"), ts)
      }
      val got = t.resolved()
        .as[(Long, String, String, String, Long)].collect().toSet
      assert(got === model(deduped), s"mismatch at seed=$seed")
    }
  }

  test("a mid-sequence compaction never changes the resolved view " +
    "(random ops, random split)") {
    // Arrival order respects ts across the split (everything at or
    // below the threshold lands before the compaction, the rest after),
    // so no post-compaction cell carries a ts older than a compacted-
    // away tombstone — the one case where HBase major-compaction parity
    // legitimately resurrects (documented in resolvedAsOf's scaladoc)
    // and a log-only replay would diverge by design.
    for (seed <- 1 to 6) {
      val ops = Gen.listOfN(40, genOp)
        .pureApply(Gen.Parameters.default, Seed(1000L + seed))
      val deduped = ops.zipWithIndex
        .groupBy(o => (o._1.key, o._1.family, o._1.qualifier, o._1.ts, o._1.tomb))
        .map(_._2.head).toList.sortBy(_._2).map(_._1)
      val cut = Gen.choose(1L, 20L)
        .pureApply(Gen.Parameters.default, Seed(2000L + seed))
      val t = KVTable(spark,
        targetPath(s"graft_kv_test/modelc_${seed}"), wipe = true)
      def apply(batch: List[Op]): Unit = {
        val puts = batch.filter(_.tomb.isEmpty)
          .map(o => (o.key, o.family, o.qualifier, s"v${o.key}_${o.ts}", o.ts))
        if (puts.nonEmpty)
          t.put(puts.toDF("key", "family", "qualifier", "value", "ts"))
        batch.filter(_.tomb.nonEmpty).groupBy(_.ts).foreach { case (ts, dels) =>
          t.delete(dels.map {
            case Op(k, _, _, _, Some("row")) => (k, None, None)
            case Op(k, f, _, _, Some("family")) => (k, Some(f), None)
            case Op(k, f, q, _, Some("cell")) => (k, Some(f), Some(q))
            case o => throw new IllegalStateException(o.toString)
          }.toDF("key", "family", "qualifier"), ts)
        }
      }
      val (before, after) = deduped.partition(_.ts <= cut)
      apply(before)
      t.compact(numBuckets = 4)
      apply(after)
      val got = t.resolved()
        .as[(Long, String, String, String, Long)].collect().toSet
      assert(got === model(deduped),
        s"mismatch at seed=$seed cut=$cut (compacted ${before.size} ops)")
    }
  }
}
