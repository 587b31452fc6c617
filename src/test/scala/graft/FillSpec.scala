package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** `fill` semantics (HBaseRDDFunctions.scala:96-101,278-343): present
  * values pass through untouched; only missing ones are looked up. */
class FillSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("fill only resolves nulls; cached values win over lookup values") {
    val in = Seq((1L, Some("cached")), (2L, Option.empty[String]),
      (3L, Option.empty[String]), (4L, Option.empty[String]))
      .toDF("k", "v")
    val lookup = Seq((1L, "fresh1"), (2L, "fresh2"), (3L, "fresh3"))
      .toDF("lk", "lv")
    val got = Joins.fill(in, "k", "v", lookup, "lk", "lv")
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("cached"),  // not overwritten by lookup
      2L -> Some("fresh2"), 3L -> Some("fresh3"),
      4L -> None))           // missing everywhere stays None (left outer)
  }
}
