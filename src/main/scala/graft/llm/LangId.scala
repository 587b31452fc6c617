package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.charTrigrams

/** Character-trigram language identification (the n-gram heuristic the
  * training-data brief calls for; the word-level stopword scorer in
  * TextOps.langId is the cheap first-pass filter).
  *
  * Train: per language, the `profileSize` most frequent character
  * trigrams of a labeled seed corpus. Classify: score each document by
  * how many of its trigrams hit each language profile; argmax with
  * alphabetical tie-break.
  *
  * Shape at scale: training is one aggregation over the (small) seed
  * corpus; profiles broadcast; classification is one broadcast join per
  * document-trigram — no all-pairs anywhere.
  */
object LangId {

  /** (lang, trigram) profiles from labeled seeds (lang, text). */
  def trainProfiles(seeds: DataFrame, profileSize: Int = 200): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("tg").asc)
    seeds.select(col("lang"), explode(charTrigrams(col("text"))).as("tg"))
      .groupBy(col("lang"), col("tg")).agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= profileSize)
      .select(col("lang"), col("tg"))
  }

  /** Classify docs (idCol, textCol) against trained profiles. */
  def classify(docs: DataFrame, profiles: DataFrame,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val docTg = docs.select(col(idCol), explode(charTrigrams(col(textCol))).as("tg"))
    val scored = docTg.join(broadcast(profiles), Seq("tg"))
      .groupBy(col(idCol), col("lang")).agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("hits").desc, col("lang").asc)
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col(idCol), col("lang").as("predicted"), col("hits"))
  }
}
