package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ByteCodec

/** Statistical distribution property (KeySpaceTest.scala:14-61 /
  * RegionPartitionerTest.scala:58-86 parity): salted keys spread evenly
  * over range partitions — relative stddev < 2% over 32 partitions for
  * 100k keys. This is the property that makes `repartitionByRange` on
  * the salted key balance at 100 TB.
  */
class KeyDistributionSpec extends AnyFunSuite {

  private def rsd(counts: Seq[Int]): Double = {
    val mean = counts.sum.toDouble / counts.size
    val sd = math.sqrt(counts.map(c => (c - mean) * (c - mean)).sum / counts.size)
    100.0 * sd / mean
  }

  test("100k sequential long keys: salt spreads over 32 buckets, RSD < 2%") {
    val n = 100000
    val parts = 32
    // bucket by the leading salt bytes — what range partitioning sees
    val counts = (0 until n)
      .map(i => ByteCodec.encodeKey(1, ByteCodec.longToBytesBE(i.toLong)))
      .groupBy(k => ((k(0) & 0xff) << 8 | (k(1) & 0xff)) * parts / 65536)
      .map(_._2.size).toSeq
    assert(counts.size === parts)
    assert(rsd(counts) < 2.0, s"RSD ${rsd(counts)} >= 2%")
  }

  test("100k random UUID keys: RSD < 2%") {
    val rnd = new scala.util.Random(42)
    val parts = 32
    val counts = (0 until 100000)
      .map { _ =>
        val u = new java.util.UUID(rnd.nextLong(), rnd.nextLong()).toString
        ByteCodec.encodeKey(2, ByteCodec.uuidToBytes(u))
      }
      .groupBy(k => ((k(0) & 0xff) << 8 | (k(1) & 0xff)) * parts / 65536)
      .map(_._2.size).toSeq
    assert(counts.size === parts)
    assert(rsd(counts) < 2.0, s"RSD ${rsd(counts)} >= 2%")
  }
}
