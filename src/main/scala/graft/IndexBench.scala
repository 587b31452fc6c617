package graft

import org.apache.spark.sql.functions._

/** Index-BUILD cost axis (dev tooling, like StreamBench).
  *
  * The ANN / LSH standing indexes are amortized artifacts: queries
  * probe them Exchange-free, and SCALING.md measures the probe side
  * (llm_ann_ivf alpha=0.25 because the corpus-sized work lives in the
  * build). That amortization claim needs its own number: this main
  * wipes each persisted index and times `AnnStore.ensure` COLD —
  * signature/assignment compute plus the bucketed parquet write — at
  * the given scale. Run once per scale factor and fit the exponent
  * like any other SCALING.md curve; the build cost is paid once per
  * corpus generation (the fingerprint tag rebuilds only when the
  * source data changes), so a near-linear alpha here is the expected
  * and acceptable shape — it's the probe side that must stay flat.
  *
  * Two build rounds per index, min taken: the first round pays
  * JIT/codegen warmup that a production build at real scale would
  * amortize into noise.
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import spark.implicits._
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def wipe(name: String): Unit = {
      graft.sources.kv.GraftFs.delete(
        RepoPaths.target(s"graft_ann/$name"), recursive = true)
      ()
    }
    val slug = graft.llm.AnnStore.slug(sfDir)

    // IVF index: corpus and centroids exactly as llm_ann_ivf_incr
    // builds them (LlmQueries "llm_ann_ivf_incr")
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter($"vec_id" % 25 =!= 0)
    val cents = graft.llm.Similarity.ivfCentroids(corpus, 40)
    val ivfSec = (1 to 2).map { _ =>
      wipe(s"graft_ivf_index_$slug")
      timed(graft.llm.AnnStore.ivfIndex(spark, sfDir, corpus, cents)
        .count(): Unit)
    }.min

    // MinHash band index: corpus as llm_dedup_minhash_incr builds it
    val docs = Tables.documents(spark, sfDir)
    val dcorpus = docs.filter($"doc_id" % 5 =!= 0)
    val mhSec = (1 to 2).map { _ =>
      wipe(s"graft_mh_band_index_$slug")
      timed(graft.llm.AnnStore.minHashBandIndex(spark, sfDir, dcorpus)
        .count(): Unit)
    }.min

    def r(v: Double) = math.round(v * 1000) / 1000.0
    println(s"""{"metric":"index_build","unit":"sec",""" +
      s""""ivf_build_sec":${r(ivfSec)},""" +
      s""""mh_band_build_sec":${r(mhSec)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
