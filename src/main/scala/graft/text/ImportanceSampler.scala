package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFns

/** DSIR-style data selection via hashed n-gram importance weights
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", 2023): hash each document's unigrams and bigrams into
  * a fixed bucket space, fit smoothed bucket distributions on a TARGET
  * sample and on the RAW corpus, and weight every raw document by
  * Σ_b c_doc[b] · ln(p_target[b]/p_raw[b]) — documents that look like
  * the target domain score high and survive the resampling gate.
  *
  * Reference scope note: not an IHOP-Reddit op; part of the brief's
  * training-pipeline surface, implementing the published method.
  *
  * Scale design: feature extraction is row-local (explode of unigram +
  * bigram hash streams, the portable md5 family so an external oracle
  * reproduces bucket ids); per-doc bucket counts are one token-level
  * aggregation; the bucket-ratio table has exactly `buckets` rows and
  * joins broadcast. The per-bucket log ratio is floor-scaled to an
  * exact integer ONCE (numerators/denominators multiplied as doubles
  * in a fixed order before the single ln), then per-doc weights are
  * pure integer arithmetic — engine-exact, no float accumulation.
  */
object ImportanceSampler {

  val Scale = 1000000L

  /** Row-local (id, bucket) feature stream: md5-hashed unigrams and
    * space-joined bigrams, modulo `buckets`. */
  def featureStream(docs: DataFrame, idCol: String, tokensCol: String,
                    buckets: Int): DataFrame = {
    require(buckets > 0, s"featureStream: buckets must be positive")
    val t = col(tokensCol)
    val grams = concat(
      t,
      transform(slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        (w: Column, i: Column) =>
          concat_ws(" ", w, element_at(t, i + 2))))
    docs.select(col(idCol), explode(grams).as("g"))
      .select(col(idCol), pmod(HashFns.md5Hash60(col("g")), lit(buckets.toLong))
        .as("b"))
  }

  /** Smoothed per-bucket counts of a corpus: (b, c) for every bucket in
    * [0, buckets) — missing buckets materialize with c = 0 so the
    * ratio table always has exactly `buckets` rows. */
  private def bucketTotals(feats: DataFrame, buckets: Int): DataFrame = {
    val spark = feats.sparkSession
    spark.range(buckets).select(col("id").as("b"))
      .join(feats.groupBy(col("b")).agg(count(lit(1)).as("c")), Seq("b"), "left")
      .select(col("b"), coalesce(col("c"), lit(0L)).as("c"))
  }

  /** The bucket-ratio table: (b, r_scaled) with r_scaled =
    * ⌊1e6 · ln(((cT+1)·(NR+B)) / ((cR+1)·(NT+B)))⌋ — add-one smoothing
    * on both sides, one ln over a fixed-order double product. */
  def ratioTable(target: DataFrame, raw: DataFrame, idCol: String,
                 tokensCol: String, buckets: Int): DataFrame = {
    val tf = featureStream(target, idCol, tokensCol, buckets)
    val rf = featureStream(raw, idCol, tokensCol, buckets)
    val nT = tf.count()
    val nR = rf.count()
    bucketTotals(tf, buckets).withColumnRenamed("c", "ct")
      .join(bucketTotals(rf, buckets).withColumnRenamed("c", "cr"), Seq("b"))
      .select(col("b"),
        floor(lit(Scale.toDouble) * log(
          ((col("ct").cast("double") + lit(1.0)) *
            lit((nR + buckets).toDouble)) /
            ((col("cr").cast("double") + lit(1.0)) *
              lit((nT + buckets).toDouble))))
          .cast("long").as("r_scaled"))
  }

  /** Per-doc importance weights over the raw corpus: (id, n_grams,
    * logw_scaled) — Σ_b c_doc[b]·r_scaled[b], integer-exact. Docs with
    * no grams weight 0. */
  def weigh(ratios: DataFrame, raw: DataFrame, idCol: String,
            tokensCol: String, buckets: Int): DataFrame = {
    val perDoc = featureStream(raw, idCol, tokensCol, buckets)
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(ratios), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"),
        sum(col("c") * col("r_scaled")).as("logw_scaled"))
    raw.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logw_scaled"), lit(0L)).as("logw_scaled"))
  }

  /** The resampling gate: keep docs whose AVERAGE per-gram scaled log
    * weight clears `minAvgScaled` (integer cross-multiplication;
    * gram-less docs drop — they carry no evidence of the target). */
  def keepCol(minAvgScaled: Long): Column =
    col("n_grams") > 0L &&
      col("logw_scaled") >= lit(minAvgScaled) * col("n_grams")
}
