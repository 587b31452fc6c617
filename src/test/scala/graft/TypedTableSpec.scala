package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.table._
import graft.write.KVTable

/** DemoSimpleApp parity (DemoSimpleApp.scala:16-107 in the reference):
  * seeded demo_simple table — F:{width,height} ~ round(gauss(1000,50)),
  * T tags ⊆ {lego,music,cars,cinema,sport} each p=0.5 — driven through
  * the typed facade.
  */
case class DemoRow(key: Long, width: Long, height: Long,
                   tags: Seq[String])

class TypedTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val N = 1000
  private val TAGS = Seq("lego", "music", "cars", "cinema", "sport")

  private lazy val demo: Seq[DemoRow] = {
    val rnd = new scala.util.Random(42)
    (0 until N).map { i =>
      DemoRow(i.toLong,
        math.round(1000 + rnd.nextGaussian() * 50),
        math.round(1000 + rnd.nextGaussian() * 50),
        TAGS.filter(_ => rnd.nextBoolean()))
    }
  }

  private lazy val table: TypedTable = {
    val kv = KVTable(spark, targetPath("graft_kv_test/demo_simple"),
      wipe = true)
    val rows = demo.toDF()
    kv.put(rows.select($"key", lit("F").as("family"), lit("width").as("qualifier"),
      $"width".cast("string").as("value"), lit(1L).as("ts")))
    kv.put(rows.select($"key", lit("F").as("family"), lit("height").as("qualifier"),
      $"height".cast("string").as("value"), lit(1L).as("ts")))
    kv.put(rows.select($"key", explode($"tags").as("qualifier"))
      .select($"key", lit("T").as("family"), $"qualifier",
        lit("").as("value"), lit(1L).as("ts")))
    new TypedTable(kv)
  }

  test("typed select of F:height matches the generator") {
    val got = table.select(TLong("F", "height"))
      .as[(Long, Long)].collect().toMap
    assert(got.size === N)
    assert(demo.forall(r => got(r.key) == r.height))
  }

  test("Tags view and membership filter (contains 'lego')") {
    val got = table.select(TTags("T"))
      .filter(array_contains($"T", "lego"))
      .select($"key").as[Long].collect().toSet
    assert(got === demo.filter(_.tags.contains("lego")).map(_.key).toSet)
  }

  test("family map view exposes width and height together") {
    val got = table.select(TFamily("F", "long"))
      .select($"key", element_at($"F", "width").as("w"),
        element_at($"F", "height").as("h"))
      .as[(Long, Long, Long)].collect()
    assert(got.length === N)
    val m = demo.map(r => r.key -> r).toMap
    assert(got.forall { case (k, w, h) => m(k).width == w && m(k).height == h })
  }

  test("cellCount = 2 + |tags| per row") {
    val got = table.cellCount.as[(Long, Long)].collect().toMap
    assert(demo.forall(r => got(r.key) == 2 + r.tags.size))
  }

  test("inner-select drops rows missing a selected column") {
    // no row has F:depth ⇒ typed select on it is empty (filterIfMissing)
    assert(table.select(TLong("F", "depth")).count() === 0)
  }

  test("typed update flows through latest-wins read") {
    // separate table — keeps the shared fixture immutable for other tests
    val kv2 = KVTable(spark, targetPath("graft_kv_test/demo_simple_upd"),
      wipe = true)
    demo.toDF().createOrReplaceTempView("demo_rows")
    kv2.put(spark.sql(
      """SELECT key, 'F' AS family, 'height' AS qualifier,
        |CAST(height AS STRING) AS value, 1L AS ts FROM demo_rows""".stripMargin))
    val table = new TypedTable(kv2)
    table.update(TLong("F", "height"),
      demo.filter(_.key < 10).map(r => (r.key, r.height + 5)).toDF("key", "value"),
      ts = 2L)
    val got = table.select(TLong("F", "height")).as[(Long, Long)]
      .collect().toMap
    assert(demo.filter(_.key < 10).forall(r => got(r.key) == r.height + 5))
    assert(demo.filter(_.key >= 10).forall(r => got(r.key) == r.height))
  }

  test("demo join: sampled area overlay with tags (DemoSimpleApp.scala:96-101)") {
    val area = table.select(TLong("F", "width"), TLong("F", "height"))
      .filter($"key" % 100 === 0) // deterministic sample
      .select($"key", ($"F_width" * $"F_height").as("area"))
    val got = area.join(table.select(TTags("T")), Seq("key"))
      .select($"key", $"area", $"T").as[(Long, Long, Seq[String])]
      .collect().map { case (k, a, t) => k -> ((a, t)) }.toMap
    val exp = demo.filter(_.key % 100 == 0)
    assert(got.size === exp.size)
    assert(exp.forall(r =>
      got(r.key) == ((r.width * r.height, r.tags.sorted))))
  }
}
