package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps.words

/** Sparse lexical retrieval over a document corpus (builder-prompt
  * north-star: the scoring op behind retrieval-augmented corpus
  * curation, contamination triage and quality-targeted sampling).
  *
  * Scale shape: the query's term list is a literal IN-filter applied
  * directly after tokenization, so the only (doc_id, token) shuffle
  * carries the handful of matching rows — the corpus tokenizes but its
  * full token stream never shuffles. Document length is a per-row
  * `size` (no explode-aggregate), document frequency and the corpus
  * stats (N, total length) ride in as broadcast cross joins, and
  * nothing touches the driver.
  */
object Retrieval {

  /** Okapi BM25 scores for `terms` over `docs(doc_id, text)`: one row
    * per document containing at least one query term.
    *
    * idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1) — the non-negative
    * Lucene variant; per-term contributions round at 6 dp before the
    * per-document sum so scores are engine-portable (the DuckDB oracle
    * reproduces them bit-for-bit at the rounded precision). */
  def bm25Scores(docs: DataFrame, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lens = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val avgdl = col("total_dl") * 1.0 / col("n_docs")
    tf.join(broadcast(df), "token")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib", round(
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)),
        6))
      .groupBy(col("doc_id")).agg(round(sum(col("contrib")), 6).as("score"))
  }

  /** Per-document mean negative log-likelihood under the corpus's own
    * bigram LM (the perplexity-proxy quality filter): predictable,
    * templated text scores LOW; incoherent token soup scores HIGH.
    * p(w2|w1) = n12/n1 — exact-integer ratios, engine-portable; the
    * model relation is corpus-sized and joins CO-PARTITIONED on
    * (w1, w2), never broadcast. Returns (doc_id, n_bigrams, nll). */
  def bigramNll(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), col("n") - 1),
          i => struct(element_at(col("w"), i).as("w1"),
            element_at(col("w"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n12"))
    val probs = c12.join(
      c12.groupBy(col("w1")).agg(sum(col("n12")).as("n1")), "w1")
      .select(col("w1"), col("w2"), (col("n12") * 1.0 / col("n1")).as("p"))
    bg.join(probs, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("p"))), 6).as("nll"))
  }

  /** Temperature-weighted domain mixing over `docs(source, lang, text)`:
    * stratum weights ∝ count^alpha (alpha < 1 flattens the mix toward
    * rare domains — the standard pre-training recipe), then a
    * DETERMINISTIC hash-gated sample toward a total budget of `target`
    * documents. Returns per-stratum (n_docs, weight, quota, n_sampled).
    *
    * Scale shape: stratum stats are one partial-agg'd groupBy; the
    * normalizer and the per-stratum admission thresholds broadcast back
    * onto the corpus, so selection is a PER-ROW hash gate — no
    * per-stratum window, no one-reducer-per-stratum, and the corpus
    * never shuffles (the final count is the only aggregation). The
    * hash gate (md5 ppm vs. threshold) makes the sample reproducible
    * across runs AND engines — the DuckDB oracle draws the identical
    * documents. */
  def domainMix(docs: DataFrame, alpha: Double = 0.5,
                target: Long = 200L): DataFrame = {
    val strata = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val z = strata.agg(sum(pow(col("n_docs"), alpha)).as("z"))
    val weighted = strata.crossJoin(broadcast(z))
      .withColumn("weight", round(pow(col("n_docs"), alpha) / col("z"), 6))
      .withColumn("quota", floor(col("weight") * target).cast("long"))
      .withColumn("p_ppm",
        floor(least(lit(1.0), col("weight") * target / col("n_docs"))
          * 1000000).cast("long"))
    val sampled = docs
      .join(broadcast(weighted.select(col("source"), col("lang"),
        col("p_ppm"))), Seq("source", "lang"))
      .filter(pmod(TextOps.sharedHash(col("text")), lit(1000000L))
        < col("p_ppm"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
    weighted.join(sampled, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"), col("n_docs"), col("weight"),
        col("quota"), coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
  }
}
