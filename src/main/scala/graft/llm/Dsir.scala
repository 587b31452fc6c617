package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps._

/** Data Selection via Importance Resampling (DSIR; Xie et al.,
  * NeurIPS 2023): score every raw document by how target-like its
  * hashed n-gram profile is, then resample with Gumbel top-k.
  *
  * The published recipe, re-expressed Spark-first:
  *
  *  1. Featurize each document into hashed unigram+bigram OCCURRENCES
  *     bucketed into `buckets` cells (the paper's hashed n-gram
  *     generative model). Feature extraction is per-row and explodes
  *     with zero shuffle.
  *  2. Fit two bag-of-buckets unigram models — target p̂ and raw q̂ —
  *     with add-one smoothing. Each is ONE partial-agg'd groupBy to at
  *     most `buckets` rows, so at 100 TB the model fit ships sketches
  *     (≤ buckets partial rows per task), never tokens, and the fitted
  *     models broadcast.
  *  3. Per-document importance weight log p̂(x)/q̂(x) = Σ_b n_b·lr(b).
  *     The per-bucket log-ratio is rounded to INTEGER MICRO-NATS once
  *     (`lr_micro`), so the per-doc sum is exact 64-bit arithmetic —
  *     associative, order-independent, bit-identical across engines
  *     and across any cluster's reduction order.
  *  4. Gumbel top-k: key = w_micro + Gumbel(0,1) micro-nats, with the
  *     Gumbel draw a pure function of the doc id ([[TextOps.hashFrac]]),
  *     making the sample deterministic and replayable — the property a
  *     resumable 100-TB selection job needs. Top-k plans as
  *     TakeOrderedAndProject (per-partition heaps, k rows shipped).
  *
  * The reference engine has no data-selection surface; this is part of
  * the beyond-reference training-data-pipeline tier (builder prompt).
  */
object Dsir {

  /** (doc_id, f): unigram + bigram occurrences of each document.
    * Expects (doc_id, text); empty tokens from repeated spaces drop. */
  def features(docs: DataFrame, extraCols: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("doc_id") ++ extraCols).map(col)
    val wt = docs.select(keep :+
      filter(split(trim(col("text")), " "), t => t =!= "").as("w"): _*)
    val uni = wt.select(keep :+ explode(col("w")).as("f"): _*)
    val bg = wt.select(keep :+ explode(
      expr("transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', w[i + 1]))"))
      .as("f"): _*)
    uni.unionByName(bg)
  }

  /** Hash features into `buckets` cells with the shared md5 hash. */
  def bucketed(feats: DataFrame, buckets: Int): DataFrame =
    feats.withColumn("b", pmod(sharedHash(col("f")), lit(buckets.toLong)))
      .drop("f")

  /** Per-bucket integer micro-nat log-ratios ln(p̂_target/q̂_raw) with
    * add-one smoothing, plus the two totals. One row per OBSERVED
    * bucket (a bucket no document hits never scores a document).
    * `isTarget` marks the rows of the target slice inside `bucketedAll`.
    */
  def logRatioMicros(bucketedAll: DataFrame, isTarget: Column,
      buckets: Int): DataFrame = {
    val marked = bucketedAll.withColumn("t", isTarget)
    val perBucket = marked.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("t"), 1L).otherwise(0L)).as("ct"))
    val totals = marked.agg(
      count(lit(1)).as("nr"),
      sum(when(col("t"), 1L).otherwise(0L)).as("nt"))
    // ((ct+1)·(nr+B)) / ((cr+1)·(nt+B)) — exact integer products cast
    // through double in a FIXED association order so both engines (and
    // every executor) evaluate the identical IEEE expression.
    perBucket.crossJoin(broadcast(totals))
      .withColumn("lr_micro",
        round(log((col("ct") + 1.0) * (col("nr") + buckets.toLong) /
          ((col("cr") + 1.0) * (col("nt") + buckets.toLong))) * 1e6)
          .cast("long"))
      .select(col("b"), col("lr_micro"))
  }

  /** Per-document importance weight in integer micro-nats: the doc's
    * bucket histogram dotted with the broadcast log-ratio vector. */
  def weights(bucketedDocs: DataFrame, lr: DataFrame): DataFrame =
    bucketedDocs.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("n") * col("lr_micro")).as("w_micro"))

  /** Deterministic Gumbel(0,1) draw in micro-nats, seeded by doc id. */
  def gumbelMicros(docId: Column): Column =
    round(-log(-log(hashFrac(concat(lit("dsir:"), docId.cast("string")))))
      * 1e6).cast("long")

  /** Gumbel top-k resample over importance weights: the DSIR selection
    * step. Deterministic, so a re-run (or a failed-stage retry on a
    * real cluster) selects the identical k documents. */
  def sample(weighted: DataFrame, k: Int): DataFrame =
    weighted.withColumn("g_micro", col("w_micro") + gumbelMicros(col("doc_id")))
      .orderBy(col("g_micro").desc, col("doc_id"))
      .limit(k)
}
