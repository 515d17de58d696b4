package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity filtering: fit bigram
  * statistics on a (clean) training corpus, score every document of a
  * (dirty) target corpus by its add-one-smoothed average bigram
  * log-probability, and keep documents above a quality threshold —
  * the classic "train KenLM on Wikipedia, filter CommonCrawl by
  * perplexity" curation stage (Wenzek et al., CCNet, 2020), with the
  * smoothing simplified from Kneser–Ney to Laplace so the score is a
  * pure closed form over exact integer counts.
  *
  * Reference scope note: IHOP-Reddit has no LM filter; this is part of
  * the brief's large-scale-training-pipeline surface (like dedup/ANN).
  *
  * Scale design: fitting is two hash aggregations over the token
  * stream (bigram counts, then prev-counts re-aggregated from the
  * vocab-sized bigram table — never a second pass over the corpus);
  * the vocabulary size is the single driver-held scalar. Scoring joins
  * the target's token-level bigram stream against the two count tables
  * — shuffle hash joins keyed on (prev, cur) / prev, AQE's skew-join
  * splitting handles the Zipf-hot function-word keys, and both count
  * tables are Zipf-bounded (≪ corpus size) so Spark may also elect to
  * broadcast them. Log terms are floor-scaled to exact integers at 1e6
  * (the q74 pattern), so per-document sums are engine-exact and the
  * keep decision is integer arithmetic — no cross-engine float drift.
  */
object NgramLm {

  /** Fitted counts. `bigramCounts` = (prev, cur, c2); `prevCounts` =
    * (prev, c1) with c1 = Σ_cur c2 (bigram-LHS occurrences, the
    * Laplace denominator base); `vocabSize` = |V| over unigrams. */
  final case class Model(bigramCounts: DataFrame, prevCounts: DataFrame,
                         vocabSize: Long)

  /** The (id, prev, cur) bigram stream of a tokenized corpus —
    * row-local: each token array expands to its adjacent pairs via a
    * single indexed lambda + explode, no shuffle. */
  def bigramStream(docs: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val t = col(tokensCol)
    val pairs = transform(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      (w: Column, i: Column) =>
        struct(w.as("prev"), element_at(t, i + 2).as("cur")))
    docs.select(col(idCol), explode(pairs).as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
  }

  /** Fit on a tokenized training corpus (`tokensCol`: array<string>). */
  def fit(docs: DataFrame, idCol: String, tokensCol: String): Model = {
    val bg = bigramStream(docs, idCol, tokensCol)
    val bigramCounts = bg.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c2"))
    // re-aggregate the (already vocab-bounded) pair table, not the corpus
    val prevCounts = bigramCounts.groupBy(col("prev"))
      .agg(sum(col("c2")).as("c1"))
    val vocabSize = docs
      .select(explode(col(tokensCol)).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    Model(bigramCounts, prevCounts, vocabSize)
  }

  /** Integer log-probability scale: term = ⌊1e6 · ln P̂(cur|prev)⌋. */
  val Scale = 1000000L

  /** Score a tokenized target corpus: one output row per input doc —
    * `n_bigrams` and the exact integer `lp_scaled` = Σ terms. Docs too
    * short to form a bigram score (0, 0). Unseen prev/pair words fall
    * through the left joins to counts of 0, which IS the Laplace
    * smoothing path: P̂ = 1 / |V|. */
  def scoreScaled(model: Model, docs: DataFrame, idCol: String,
                  tokensCol: String): DataFrame = {
    val terms = bigramStream(docs, idCol, tokensCol)
      .join(model.bigramCounts, Seq("prev", "cur"), "left")
      .join(model.prevCounts, Seq("prev"), "left")
      .select(col(idCol),
        floor(lit(Scale.toDouble) * log(
          (coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)).cast("double") +
              lit(model.vocabSize.toDouble))))
          .cast("long").as("term"))
    val agg = terms.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("term")).as("lp_scaled"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lp_scaled"), lit(0L)).as("lp_scaled"))
  }

  /** The filter itself: keep docs whose AVERAGE scaled log-prob clears
    * `minAvgScaled` (e.g. -9_000_000 ≈ perplexity ≤ e^9). Integer
    * cross-multiplication — no division, no floats. Bigram-less docs
    * pass (nothing to judge them on; gate them by length instead). */
  def keepCol(minAvgScaled: Long): Column =
    col("n_bigrams") === 0L ||
      col("lp_scaled") >= lit(minAvgScaled) * col("n_bigrams")

  def perplexityFilter(model: Model, docs: DataFrame, idCol: String,
                       tokensCol: String, minAvgScaled: Long): DataFrame = {
    val scored = scoreScaled(model, docs, idCol, tokensCol)
    docs.join(scored.where(keepCol(minAvgScaled)).select(col(idCol)),
      Seq(idCol), "left_semi")
  }
}
