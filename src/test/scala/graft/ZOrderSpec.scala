package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ZOrder
import scala.jdk.CollectionConverters._

/** Z-order layout contract (operators/ZOrder.scala): clustering on the
  * Morton curve of (l_orderkey, l_partkey) must shrink the per-row-group
  * min/max envelope of BOTH columns versus the key-sorted layout — the
  * statistic parquet row-group pruning actually uses. Measured from the
  * real parquet footers, not inferred from the plan.
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** (min, max) of `col`'s statistics for every row group under dir. */
  private def statRanges(dir: String, col: String): Seq[(Long, Long)] = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
    files.toSeq.flatMap { f =>
      val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), new Configuration()))
      try rdr.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == col).get
        val st = c.getStatistics
        (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
          st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
      } finally rdr.close()
    }
  }

  private def avgSpan(rs: Seq[(Long, Long)]): Double =
    rs.map { case (mn, mx) => (mx - mn).toDouble }.sum / rs.size

  test("z-order shrinks both columns' row-group envelopes vs the key sort") {
    val li = Tables.lineitem(spark, sf)
    val zDir = targetPath("graft_zorder/z")
    val kDir = targetPath("graft_zorder/k")
    ZOrder.writeZOrdered(li, "l_orderkey", "l_partkey", zDir, numFiles = 8)
    li.repartitionByRange(8, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(kDir)

    val zPart = statRanges(zDir, "l_partkey")
    val kPart = statRanges(kDir, "l_partkey")
    val zOrd = statRanges(zDir, "l_orderkey")
    val kOrd = statRanges(kDir, "l_orderkey")
    assert(zPart.size >= 8 && kPart.size >= 8, "expected >=8 row groups")

    // key-sorted files each span ~the FULL partkey domain; z-ordered
    // files cover a rectangle — with 8 range partitions the partkey
    // side splits at least twice (y gets the higher interleave bits)
    assert(avgSpan(zPart) < 0.5 * avgSpan(kPart),
      s"partkey envelope barely shrank: z=${avgSpan(zPart)} key-sorted=${avgSpan(kPart)}")
    // ...while the orderkey side must not degrade to unclustered: each
    // z-file still covers well under the whole orderkey domain
    val fullOrd = zOrd.map(_._2).max - zOrd.map(_._1).min
    assert(avgSpan(zOrd) < 0.8 * fullOrd,
      s"orderkey clustering lost: avg span ${avgSpan(zOrd)} of $fullOrd")

    // layout change must not change content
    val got = spark.read.parquet(zDir)
      .select($"l_orderkey", $"l_linenumber").as[(Long, Long)].collect().toSet
    val want = li.select($"l_orderkey", $"l_linenumber")
      .as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("degenerate domains survive: constant column, single file") {
    val df = (0L until 100L).map(i => (i, 7L)).toDF("a", "b")
    val dir = targetPath("graft_zorder/const")
    // b's domain collapses to a point (mx == mn) — rank must not
    // divide by zero, and the layout degrades to a plain sort on a
    graft.operators.ZOrder.writeZOrdered(df, "a", "b", dir, numFiles = 1)
    val back = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
    assert(back === (0L until 100L).map(i => (i, 7L)).toSet)
  }

  test("interleave is monotone per dimension on a fixed other-dimension") {
    // z(x, y0) must order like x (same y) — the property that makes
    // range-partitioning on z a valid clustering of both dimensions
    val df = (0L until 256L).map(i => (i, 77L)).toDF("x", "y")
      .select(ZOrder.interleave($"x", $"y").as("z"), $"x")
      .orderBy($"x").as[(Long, Long)].collect()
    assert(df.map(_._1).toSeq === df.map(_._1).sorted.toSeq,
      "z not monotone in x for fixed y")
  }
}
