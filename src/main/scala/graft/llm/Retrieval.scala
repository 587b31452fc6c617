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
}
