package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.kv.GraftFs

/** Persisted ANN index store — the PHYSICAL form of the "build once,
  * probe forever" incremental-ingest claim: an index lands on disk as
  * a parquet table CLUSTERED BY its probe-join key, so a query batch's
  * candidate join plans with the index's storage partitioning and the
  * Exchange (if any) lands on the BATCH side only — corpus-sized data
  * never moves for an ingest, physically, not just by argument.
  * PlanSpec pins this: zero shuffle in the index-scan subtree.
  *
  * Indexes live here rather than in the KV catalog's bucket layout
  * because they are typed COLUMNAR rows (embedding arrays, signature
  * strings) whose probe key is not the KV store's row key — the
  * warehouse bucketed-parquet path keeps them native instead of
  * round-tripping through a cell codec, with the identical
  * no-Exchange-on-index-side plan property.
  *
  * Session metadata: Spark's in-memory catalog forgets tables across
  * JVMs, but bucketed FILES are self-describing (the writer embeds the
  * bucket id in each file name), so the marker records the recipe tag
  * plus the schema DDL and a fresh session re-registers the existing
  * location with CREATE TABLE ... CLUSTERED BY ... LOCATION — no
  * rebuild, same bucketed scan.
  */
object AnnStore {

  /** Table-name-safe slug of a dataset dir (the pairs2 discipline —
    * one artifact per dataset so bench warmup/timed alternation never
    * rebuilds). */
  def slug(d: String): String =
    d.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "")

  /** Read the named bucketed index, building it (once per recipe tag)
    * or re-registering existing bucket files (once per session) as
    * needed. `clusterCols` must equal the probe join's key set exactly
    * — Spark only credits a bucketed scan's partitioning to a join
    * when the join keys match the bucket columns. */
  def ensure(s: SparkSession, name: String, buckets: Int,
             clusterCols: Seq[String], tag: String)
            (build: => DataFrame): DataFrame = {
    val path = graft.RepoPaths.target(s"graft_ann/$name")
    val marker = s"$path/_graft_setup.txt"
    val existing = GraftFs.readString(marker)
    if (!existing.exists(_.startsWith(tag + "\n"))) {
      val df = build
      val schemaDdl = df.schema.toDDL
      GraftFs.delete(path, recursive = true)
      s.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite")
        .bucketBy(buckets, clusterCols.head, clusterCols.tail: _*)
        .sortBy(clusterCols.head, clusterCols.tail: _*)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
      GraftFs.writeString(marker, tag + "\n" + schemaDdl)
    } else if (!s.catalog.tableExists(name)) {
      val ddl = existing.get.split("\n", 2)(1)
      s.sql(
        s"""CREATE TABLE $name ($ddl) USING PARQUET
           |CLUSTERED BY (${clusterCols.mkString(", ")})
           |SORTED BY (${clusterCols.mkString(", ")})
           |INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    s.table(name)
  }

  /** The IVF index of a corpus, bucketed by `cent_id` (the probe key —
    * Similarity.ivfProbe joins queries to index buckets on it). */
  def ivfIndex(s: SparkSession, d: String, corpus: DataFrame,
               cents: DataFrame): DataFrame =
    ensure(s, s"graft_ivf_index_${slug(d)}", buckets = 8,
      clusterCols = Seq("cent_id"), tag = s"ivf v1 $d")(
      Similarity.ivfIndex(corpus, cents))

  /** The minhash band index of a corpus, bucketed by `(b, bucket)`
    * (the candidate equi-join key in Dedup.minHashLshIncremental). */
  def minHashBandIndex(s: SparkSession, d: String, corpus: DataFrame)
      : DataFrame =
    ensure(s, s"graft_mh_band_index_${slug(d)}", buckets = 8,
      clusterCols = Seq("b", "bucket"), tag = s"mhband v1 $d")(
      Dedup.minHashBandIndex(corpus))
}
