package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines (builder-prompt
  * north-star: beyond the reference surface).
  *
  * Everything is built from codegen'd `functions._` expressions — no
  * UDFs — so at 100 TB the whole pipeline stays inside whole-stage
  * codegen and the only shuffles are the explicit groupBys.
  */
object TextOps {

  /** Engine-portable 60-bit hash: md5 prefix as integer. Chosen because
    * any SQL engine (the DuckDB oracle included) computes the identical
    * value — the basis for cross-checkable MinHash/SimHash/fingerprints. */
  def sharedHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 16^15 = 2^60 — [[sharedHash]]'s range, exact in a double. */
  val HASH_DENOM: Long = 1152921504606846976L

  /** Deterministic uniform(0,1) coin: [[sharedHash]] / 2^60. The
    * denominator is a power of two so the division is EXACT in double
    * and both engines produce the identical fraction — every
    * deterministic sampling / sketch operator must use this one recipe
    * (never re-derive the constant inline). */
  def hashFrac(seed: Column): Column =
    sharedHash(seed) / lit(HASH_DENOM.toDouble)

  /** DuckDB side of [[hashFrac]] over a SQL string expression. */
  def hashFracSql(seedSql: String): String =
    s"('0x' || substr(md5($seedSql), 1, 15))::BIGINT / 1152921504606846976.0"

  /** Whitespace tokens of a (trimmed) document. */
  def words(text: Column): Column = split(trim(text), " ")

  /** Word k-grams as strings ("w1 w2 w3"), distinct per document. */
  def shingles(w: Column, k: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - (k - 1), lit(0))),
      i => concat_ws(" ", (0 until k).map(o => element_at(w, i + o)): _*)))

  val EN_STOP: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")
  val STOPLISTS: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ein", "in", "ist"),
    "en" -> EN_STOP,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "un", "en", "est"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有"))

  /** Language-ID by stopword scoring; ties resolve to the alphabetically
    * first language (deterministic argmax). */
  def langId(w: Column): Column = {
    val scores = STOPLISTS.map { case (lang, stop) =>
      lang -> size(array_intersect(w, array(stop.map(lit): _*)))
    }
    // alphabetical CASE chain with >= ⇒ first-alphabetical argmax
    scores.tail.foldLeft(when(
        scores.tail.map(s => scores.head._2 >= s._2).reduce(_ && _),
        lit(scores.head._1))) { case (acc, (lang, sc)) =>
      acc.when(
        scores.filter(_._1 != lang).map(s => sc >= s._2).reduce(_ && _),
        lit(lang))
    }
  }

  /** Character trigrams of a document (lowercased, space-normalized). */
  def charTrigrams(text: Column): Column = {
    val t = lower(trim(text))
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - 2, lit(0))),
      i => t.substr(i, lit(3))))
  }

  /** Rolling polynomial fingerprint over the token stream:
    * fold((acc*31 + h(w)) mod P) — order-sensitive document identity. */
  def fingerprint(w: Column): Column = {
    val P = 1000000007L
    aggregate(
      transform(w, x => pmod(sharedHash(x), lit(P))),
      lit(0L),
      (acc, h) => pmod(acc * 31L + h, lit(P)))
  }
}
