package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.LangId

/** Trigram language-ID on a small real multilingual corpus: train on
  * most sentences per language, classify held-out ones. */
class LangIdSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    ("en", "the quick brown fox jumps over the lazy dog near the river"),
    ("en", "she sells sea shells by the sea shore every single morning"),
    ("en", "this is a simple english sentence about nothing in particular"),
    ("en", "reading books in the evening is a wonderful way to relax"),
    ("de", "der schnelle braune fuchs springt über den faulen hund am fluss"),
    ("de", "sie verkauft muscheln am meeresufer jeden einzelnen morgen"),
    ("de", "dies ist ein einfacher deutscher satz über nichts besonderes"),
    ("de", "abends bücher zu lesen ist eine wunderbare art sich zu entspannen"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso junto al río"),
    ("es", "ella vende conchas de mar en la orilla cada mañana"),
    ("es", "esta es una frase sencilla en español sobre nada en particular"),
    ("es", "leer libros por la noche es una manera maravillosa de relajarse"))

  private val holdout = Seq(
    ("en", "a lazy afternoon with a good book and warm tea"),
    ("de", "ein fauler nachmittag mit einem guten buch und warmem tee"),
    ("es", "una tarde perezosa con un buen libro y té caliente"))

  test("held-out sentences classify to their language") {
    val profiles = LangId.trainProfiles(corpus.toDF("lang", "text"), 150)
    val docs = holdout.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "truth", "text")
    val got = LangId.classify(docs, profiles)
      .join(docs.select($"doc_id", $"truth"), Seq("doc_id"))
      .select($"doc_id", $"predicted", $"truth")
      .as[(Long, String, String)].collect()
    assert(got.length === 3)
    val correct = got.count(r => r._2 == r._3)
    assert(correct === 3, s"misclassified: ${got.filterNot(r => r._2 == r._3).toSeq}")
  }
}
