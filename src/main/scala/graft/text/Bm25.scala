package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson–Spärck Jones, the Lucene-default
  * scoring form): fit corpus statistics (per-term document frequency,
  * doc count, token count), then score documents against a query set
  * and return the top-k per query. The lexical complement of the ANN
  * operators — a training-data pipeline uses it for targeted corpus
  * probes ("find the docs about X") and decontamination audits.
  *
  * Reference scope note: IHOP-Reddit has no retrieval op; this is part
  * of the brief's pipeline surface, scoring with the published Okapi
  * BM25 formula (k1 = 1.2, b = 0.75).
  *
  * Scale design: the token stream is semi-filtered by the (tiny,
  * broadcast) query vocabulary BEFORE any aggregation, so tf is only
  * computed for query terms — the corpus-wide work is one filtered
  * explode + one (doc, term) count, never a full-vocab tf table. The
  * df side joins broadcast (query-vocab-bounded). Per-(query, doc,
  * term) scores are floor-scaled to exact integers at 1e6 (the q74
  * discipline — both engines divide before ln and multiply in the
  * same order), so per-doc sums and the rank order are engine-exact.
  * The final top-k window partitions by query id — query-count
  * cardinality, not corpus cardinality.
  */
object Bm25 {

  /** Corpus statistics. `df`: (w, df); `nDocs`/`nTokens` drive idf and
    * the average document length (two driver scalars, one agg action). */
  final case class Stats(df: DataFrame, nDocs: Long, nTokens: Long)

  val K1 = 1.2
  val B = 0.75
  val Scale = 1000000L

  def fit(docs: DataFrame, idCol: String, tokensCol: String): Stats = {
    val dfT = docs
      .select(col(idCol), explode(array_distinct(col(tokensCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val r = docs
      .agg(count(lit(1)).as("nd"), sum(size(col(tokensCol))).as("nt")).head()
    Stats(dfT, r.getLong(0), r.getLong(1))
  }

  /** Top-k docs per query, scored ⌊1e6 · Σ_w idf(w)·tfnorm(w)⌋ with
    * ties broken by doc id. `queries`: (qid, terms). Docs containing
    * none of a query's terms never enter that query's ranking. */
  def topKScaled(stats: Stats, docs: DataFrame, idCol: String,
                 tokensCol: String, queries: Seq[(Long, Seq[String])],
                 k: Int): DataFrame = {
    require(k > 0, s"topKScaled: k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = queries.flatMap { case (q, ts) => ts.distinct.map(q -> _) }
      .toDF("qid", "w")
    val qWords = queries.flatMap(_._2).distinct
    // semi-filter the token stream on the query vocab BEFORE aggregating
    val tf = docs
      .select(col(idCol), size(col(tokensCol)).as("dl"),
        explode(col(tokensCol)).as("w"))
      .where(col("w").isin(qWords: _*))
      .groupBy(col(idCol), col("dl"), col("w")).agg(count(lit(1)).as("tf"))
    val avgdl = lit(stats.nTokens.toDouble) / lit(stats.nDocs.toDouble)
    val terms = tf
      .join(broadcast(qdf), Seq("w"))
      .join(broadcast(stats.df.where(col("w").isin(qWords: _*))), Seq("w"))
      .select(col("qid"), col(idCol),
        floor(lit(1000000.0) *
          log(lit(1.0) + (lit(stats.nDocs.toDouble) - col("df").cast("double")
            + lit(0.5)) / (col("df").cast("double") + lit(0.5))) *
          // literal 2.2 / 0.25, NOT K1+1 / 1-B: Scala's 1.2+1 is one ulp
          // off the parsed literal 2.2, and the oracle parses literals
          (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(K1) *
            (lit(0.25) + lit(B) * (col("dl").cast("double") / avgdl))))
          .cast("long").as("ts"))
    val scored = terms.groupBy(col("qid"), col(idCol))
      .agg(sum(col("ts")).as("score_scaled"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("score_scaled").desc, col(idCol).asc)).cast("long"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col(idCol), col("score_scaled"))
  }
}
