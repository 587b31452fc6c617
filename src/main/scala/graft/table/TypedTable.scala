package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.write.KVTable

/** Typed column mappings over the KV cell store — the reference's
  * `Transformation` surface (Transformation.scala:8-13,
  * ColumnTransformation.scala:11-52, FamilyTransformation.scala:12-80,
  * HBaseTableSimple.scala:57-67 Tags) rebuilt Spark-first:
  *
  *  - a `TCol[V]` is a named, typed `family:qualifier` cell with `read`
  *    as a Catalyst expression (schema-on-read, like the reference) and
  *    `cells` for write-side inverse mapping;
  *  - predicates are plain `Column` expressions, so Catalyst pushes them
  *    down / fuses them — the reference's `TransformationFilter` for free;
  *  - `select` reproduces the implicit inner-select semantics: a row
  *    missing any selected column is dropped (`filterIfMissing`,
  *    HBaseRDDFunctions.scala:54-70 — SURVEY §7.4 risk 3).
  */
sealed trait TCol[V] {
  def family: String
  def name: String

  /** Read expression over the wide row's `cells` map. */
  def read(cells: Column): Column

  /** Output column name. */
  def alias: String = s"${family}_$name"
}

/** Single-cell typed columns (ColumnTransformation TBool…TString). */
abstract class CellCol[V](val family: String, val name: String,
                          castTo: String) extends TCol[V] {
  def read(cells: Column): Column =
    element_at(cells, s"$family:$name").cast(castTo)
}

case class TBool(f: String, q: String)   extends CellCol[Boolean](f, q, "boolean")
case class TInt(f: String, q: String)    extends CellCol[Int](f, q, "int")
case class TLong(f: String, q: String)   extends CellCol[Long](f, q, "long")
case class TDouble(f: String, q: String) extends CellCol[Double](f, q, "double")
case class TString(f: String, q: String) extends CellCol[String](f, q, "string")

/** Whole-family map view (FamilyTransformation: family → Map[K,V]). */
case class TFamily(family: String, castTo: String = "string") extends TCol[Map[String, String]] {
  val name = "*"
  override def alias: String = family
  def read(cells: Column): Column = {
    val p = family + ":"
    map_from_entries(transform(
      filter(map_entries(cells), e => e.getField("key").startsWith(p)),
      e => struct(
        e.getField("key").substr(lit(p.length + 1), lit(1 << 20)).as("key"),
        e.getField("value").cast(castTo).as("value"))))
  }
}

/** Qualifier-set family (Tags, HBaseTableSimple.scala:57-67): the set of
  * qualifiers present in the family. */
case class TTags(family: String) extends TCol[Seq[String]] {
  val name = "*"
  override def alias: String = family
  def read(cells: Column): Column = {
    val p = family + ":"
    array_sort(transform(
      filter(map_entries(cells), e => e.getField("key").startsWith(p)),
      e => e.getField("key").substr(lit(p.length + 1), lit(1 << 20))))
  }
}

/** Typed facade over a KVTable (HBaseTable[K] analogue). */
class TypedTable(val kv: KVTable) {
  import kv.spark.implicits._

  /** Wide latest-wins row view: (key, cells: map<"family:qualifier", value>).
    * One hash aggregation over the resolved cells; at scale this is the
    * compacted table's natural read shape. */
  def wide: DataFrame = kv.resolved()
    .groupBy($"key")
    .agg(map_from_entries(collect_list(struct(
      concat($"family", lit(":"), $"qualifier").as("k"), $"value".as("v"))))
      .as("cells"))

  /** Typed multi-select (HBaseTable.scala:67-98, up to N transformations)
    * with the reference's inner-select semantics: rows missing any
    * selected single-cell column are dropped. */
  def select(ts: TCol[_]*): DataFrame = {
    val base = wide
    val projected = base.select(
      ($"key" +: ts.map(t => t.read($"cells").as(t.alias))): _*)
    ts.filter(_.isInstanceOf[CellCol[_]])
      .foldLeft(projected)((df, t) => df.filter(col(t.alias).isNotNull))
  }

  /** Typed update (HBaseTable.update, M1): write one column's values. */
  def update(t: CellCol[_], updates: DataFrame, ts: Long): Unit =
    kv.put(updates.select($"key", lit(t.family).as("family"),
      lit(t.name).as("qualifier"), $"value".cast("string").as("value"),
      lit(ts).as("ts")))

  /** Per-row live-cell count (CellCount, HBaseTableSimple.scala:45-54). */
  def cellCount: DataFrame =
    kv.resolved().groupBy($"key").agg(count(lit(1)).as("n_cells"))
}
