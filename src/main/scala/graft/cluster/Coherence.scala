package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** u_mass topic coherence (SURVEY.md §2.10 X10; reference uses gensim
  * `CoherenceModel(coherence="u_mass", topn=20)`,
  * `ihop/clustering.py:799-822,1017-1033`).
  *
  * u_mass(topic) = mean over ordered top-term pairs (i later than j) of
  * log((D(w_i, w_j) + 1) / D(w_j)), natural log, where D counts
  * documents containing the term(s). The document-frequency and
  * co-document-frequency counts are Spark aggregations over the
  * tokenized corpus (one explode + self-join on doc id, restricted to
  * the union of top terms — tiny); only the per-pair counts reach the
  * driver.
  */
object Coherence {

  /** @param tokenized corpus with (docIdCol, tokensCol: array<string>)
    * @param topics    per-topic ordered top terms (most probable first)
    * @return per-topic u_mass scores, aligned with `topics`
    */
  def uMass(tokenized: DataFrame, docIdCol: String, tokensCol: String,
            topics: Seq[Seq[String]]): Seq[Double] = {
    val allTerms = topics.flatten.distinct
    if (allTerms.isEmpty) return topics.map(_ => 0.0)
    val spark = tokenized.sparkSession
    import spark.implicits._
    val termsDf = broadcast(allTerms.toDF("_term"))

    // doc → distinct top-terms it contains; persisted because both the
    // doc-frequency aggregate and the co-occurrence self-join (which
    // reads it twice more) are separate actions over it — without the
    // persist the corpus explode+join runs three times
    val occur = tokenized
      .select(col(docIdCol).as("_doc"), explode(col(tokensCol)).as("_term"))
      .join(termsDf, Seq("_term"))
      .distinct()
      .persist()

    val (docFreq, coFreq) = try {
      val df0 = occur.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
        .as[(String, Long)].collect().toMap

      val cf = occur.as("x").join(occur.as("y"), col("x._doc") === col("y._doc"))
        .where(col("x._term") < col("y._term"))
        .groupBy(col("x._term").as("_a"), col("y._term").as("_b"))
        .agg(count(lit(1)).as("_co"))
        .as[(String, String, Long)].collect()
        .map { case (a, b, c) => (a, b) -> c }.toMap
      (df0, cf)
    } finally occur.unpersist(false)

    def co(a: String, b: String): Long =
      coFreq.getOrElse(if (a < b) (a, b) else (b, a), 0L)

    topics.map { terms =>
      val pairs = for {
        i <- terms.indices; j <- 0 until i
        if docFreq.getOrElse(terms(j), 0L) > 0
      } yield math.log((co(terms(i), terms(j)) + 1.0) / docFreq(terms(j)))
      if (pairs.isEmpty) 0.0 else pairs.sum / pairs.size
    }
  }
}
