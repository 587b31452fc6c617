package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.Dsir

/** DSIR importance resampling (Xie et al. 2023): the weight model must
  * genuinely prefer target-like documents, and the Gumbel top-k select
  * must be deterministic and weight-monotone. The exact selected set is
  * hash-checked against DuckDB by the llm_dsir_sample oracle. */
class DsirSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  override lazy val sf: String = "/root/testdata/sf0.01"
  private val B = 64

  test("importance weights separate target-language documents") {
    val docs = Tables.documents(spark, sf)
    val fb = Dsir.bucketed(Dsir.features(docs, Seq("lang")), B)
    val w = Dsir.weights(fb, Dsir.logRatioMicros(fb, $"lang" === "en", B))
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val means = w.groupBy($"lang" === "en").agg(avg($"w_micro"))
      .as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false),
      s"mean target weight ${means(true)} !> raw ${means(false)}")
    // and the selected sample is en-enriched vs the corpus base rate
    val sel = SparkEntry.queries("llm_dsir_sample")(spark, sf)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val enSel = sel.filter($"lang" === "en").count().toDouble / sel.count()
    val enAll = docs.filter($"lang" === "en").count().toDouble / docs.count()
    assert(enSel > enAll,
      s"selected en-fraction $enSel !> corpus base rate $enAll")
  }

  test("Gumbel top-k is deterministic and weight-monotone in expectation") {
    val docs = Tables.documents(spark, sf)
    val fb = Dsir.bucketed(Dsir.features(docs, Seq("lang")), B)
    val w = Dsir.weights(fb, Dsir.logRatioMicros(fb, $"lang" === "en", B))
    val a = Dsir.sample(w, 50).select($"doc_id").as[Long].collect().toSeq
    val b = Dsir.sample(w, 50).select($"doc_id").as[Long].collect().toSeq
    assert(a === b) // identical replay, order included
    // selected docs carry higher mean weight than the corpus
    val selMean = Dsir.sample(w, 50).agg(avg($"w_micro")).as[Double]
      .collect().head
    val allMean = w.agg(avg($"w_micro")).as[Double].collect().head
    assert(selMean > allMean)
  }

  test("bucket model: occurrence totals are conserved") {
    val docs = Tables.documents(spark, sf)
    val feats = Dsir.features(docs)
    val fb = Dsir.bucketed(feats, B)
    assert(fb.count() === feats.count())
    assert(fb.agg(max($"b")).as[Long].collect().head < B)
    assert(fb.agg(min($"b")).as[Long].collect().head >= 0)
  }
}
