package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def slug(d: String): String = graft.Staging.slug(d)

  /** Read the named bucketed index, building it (once per recipe tag)
    * or re-registering existing bucket files (once per session) as
    * needed — the [[graft.Staging]] discipline under the ANN path root.
    * `clusterCols` must equal the probe join's key set exactly
    * — Spark only credits a bucketed scan's partitioning to a join
    * when the join keys match the bucket columns. */
  def ensure(s: SparkSession, name: String, buckets: Int,
             clusterCols: Seq[String], tag: String)
            (build: => DataFrame): DataFrame =
    graft.Staging.ensureBucketed(s, name,
      graft.RepoPaths.target(s"graft_ann/$name"), buckets, clusterCols,
      tag)(build)

  /** The IVF index of a corpus, bucketed by `cent_id` (the probe key —
    * Similarity.ivfProbe joins queries to index buckets on it). The
    * recipe tag carries a fingerprint of the SOURCE embeddings files,
    * so regenerating the dataset at the same path rebuilds the index
    * instead of serving a stale one. */
  def ivfIndex(s: SparkSession, d: String, corpus: DataFrame,
               cents: DataFrame): DataFrame =
    ensure(s, s"graft_ivf_index_${slug(d)}", buckets = 8,
      clusterCols = Seq("cent_id"),
      tag = s"ivf v1 $d fp=${graft.Staging.fingerprint(s"$d/embeddings.parquet")}")(
      Similarity.ivfIndex(corpus, cents))

  /** The minhash band index of a corpus, bucketed by `(b, bucket)`
    * (the candidate equi-join key in Dedup.minHashLshIncremental);
    * tag fingerprints the source documents files. */
  def minHashBandIndex(s: SparkSession, d: String, corpus: DataFrame)
      : DataFrame =
    ensure(s, s"graft_mh_band_index_${slug(d)}", buckets = 8,
      clusterCols = Seq("b", "bucket"),
      tag = s"mhband v1 $d fp=${graft.Staging.fingerprint(s"$d/documents.parquet")}")(
      Dedup.minHashBandIndex(corpus))
}
