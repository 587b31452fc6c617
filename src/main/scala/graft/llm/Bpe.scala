package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — the subword-tokenizer training
  * pass of an LLM data pipeline (reference-free; brief-mandated).
  *
  * Algorithm (classic BPE): words split into single-character symbols;
  * each round counts adjacent symbol pairs across the corpus (weighted
  * by word frequency), merges the most frequent pair everywhere
  * (greedy leftmost, ties broken lexicographically), and repeats.
  *
  * Scale shape: the corpus collapses to the WORD-FREQUENCY table first
  * (one tokenize + partial-agg'd groupBy — the only corpus-sized
  * shuffle, shared with llm_vocab_topk's shape); every merge round then
  * runs over the vocabulary only: one partial-agg'd pair count
  * (vocab-sized, tiny vs corpus), a single-row argmax collect, and a
  * broadcast-as-literal per-row rewrite. N rounds = N vocab-sized
  * shuffles; the corpus is never re-read. This is the same
  * iterate-with-broadcast-decision pattern as k-means refinement and
  * PageRank (Similarity.kmeansIvf, GraphOps.pageRank).
  *
  * Determinism contract (what makes the DuckDB oracle exact): a symbol
  * sequence is encoded as a string where every symbol owns its flanking
  * spaces (`" a  b  c "`), so `replace(enc, " l  r ", " lr ")` —
  * leftmost non-overlapping in both engines — IS the greedy BPE merge:
  * a consumed symbol's spaces go with it, so overlapping candidate
  * pairs (`a a a`) merge exactly like the sequential fold would.
  * Pair counts are exact longs; the argmax tie-breaks on (count desc,
  * left asc, right asc).
  */
object Bpe {

  case class Merge(round: Long, lhs: String, rhs: String, cnt: Long)

  /** Corpus word-frequency table (whitespace tokens, as the rest of
    * the text stack tokenizes). */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Applies learned merges to the word table — the TOKENIZE step that
    * pairs with [[learn]] (train + apply = the full subword tokenizer).
    * Returns `(word, freq, tokens)` with `tokens` the word's subword
    * array after all merges, greedy-leftmost per round exactly as
    * training folded them. A broadcast-free per-row rewrite: the merge
    * list is driver-side literals, so encoding a 100-TB corpus is one
    * embarrassingly parallel pass. */
  def encode(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val enc0 = regexp_replace(col("word"), "(.)", " $1 ")
    val enc = merges.foldLeft(enc0) { (e, m) =>
      replace(e, lit(s" ${m.lhs}  ${m.rhs} "), lit(s" ${m.lhs}${m.rhs} "))
    }
    words.select(col("word"), col("freq"),
      split(trim(enc), "  ").as("tokens"))
  }

  /** Learns the top-`rounds` merges. Returns one row per round:
    * `(round, lhs, rhs, cnt)` — the merged pair and its corpus
    * frequency at selection time. */
  def learn(spark: SparkSession, words: DataFrame, rounds: Int): Seq[Merge] = {
    var enc = words
      .select(regexp_replace(col("word"), "(.)", " $1 ").as("enc"),
        col("freq"))
      .cache()
    val merges = Seq.newBuilder[Merge]
    try {
      for (round <- 1 to rounds) {
        val winners = enc
          .select(col("freq"), split(trim(col("enc")), "  ").as("t"))
          .select(col("freq"), explode(expr(
            "transform(slice(t, 1, greatest(size(t) - 1, 0)), " +
              "(x, i) -> struct(x AS l, t[i + 1] AS r))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (winners.isEmpty) return merges.result()
        val w = winners.head
        val (l, r, c) = (w.getString(0), w.getString(1), w.getLong(2))
        merges += Merge(round.toLong, l, r, c)
        // broadcast the decision as literals; per-row rewrite, no shuffle.
        // Column-API replace with lit() args: learned symbols never pass
        // through the SQL parser, so quotes/backslashes in real-corpus
        // tokens (apostrophes survive whitespace tokenization) are safe.
        val next = enc.withColumn("enc",
          replace(col("enc"), lit(s" $l  $r "), lit(s" $l$r "))).cache()
        next.count()
        enc.unpersist()
        enc = next
      }
      merges.result()
    } finally enc.unpersist()
  }
}
