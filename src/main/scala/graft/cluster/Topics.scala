package graft.cluster

import org.apache.spark.ml.clustering.{LDA, LDAModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LDA topic modeling (SURVEY.md §2.9 M6–M8).
  *
  * Mirrors the reference's Spark LDA setup (`ihop/clustering.py:886-922`):
  * online optimizer, asymmetric document concentration
  * alpha_i = 1 / (i + sqrt(k)) (gensim-matching,
  * `ihop/clustering.py:1108-1140`; the EM optimizer forbids asymmetric
  * alpha, so online is required), tunable subsampling.
  */
object Topics {

  final case class Config(
      k: Int = 250,
      maxIter: Int = 50,
      optimizer: String = "online",
      subsamplingRate: Double = 0.05,
      seed: Long = 42L,
      featuresCol: String = "vectorized")

  /** Asymmetric prior 1/(i + sqrt(k)) (reference `ihop/clustering.py:1130-1140`). */
  def asymmetricAlpha(k: Int): Array[Double] =
    Array.tabulate(k)(i => 1.0 / (i + math.sqrt(k.toDouble)))

  def fit(df: DataFrame, cfg: Config = Config()): LDAModel = {
    require(cfg.optimizer == "online",
      "asymmetric docConcentration requires the online optimizer " +
        "(reference raises NotImplementedError for em — ihop/clustering.py:915)")
    new LDA()
      .setK(cfg.k).setMaxIter(cfg.maxIter).setOptimizer(cfg.optimizer)
      .setDocConcentration(asymmetricAlpha(cfg.k))
      .setSubsamplingRate(cfg.subsamplingRate)
      .setSeed(cfg.seed)
      .setFeaturesCol(cfg.featuresCol)
      .fit(df)
  }

  /** M7/M8: topics with terms resolved to words — distributed join
    * against the vocabulary instead of an index→word UDF (reference
    * `ihop/clustering.py:924-1015` uses a Python UDF; a join keeps the
    * whole expression inside Catalyst and scales to any vocab size). */
  def describeTopicsWithWords(spark: SparkSession, model: LDAModel,
                              vocab: Array[String], maxTerms: Int = 20): DataFrame = {
    import spark.implicits._
    val vocabDf = vocab.zipWithIndex.map { case (w, i) => (i, w) }
      .toSeq.toDF("term_id", "word")
    model.describeTopics(maxTerms)
      .select(col("topic"), posexplode(col("termIndices")).as(Seq("pos", "term_id")))
      .join(broadcast(vocabDf), Seq("term_id"))
      .groupBy(col("topic"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("word")))),
          p => p.getField("word")), " ").as("terms"))
      .orderBy(col("topic"))
  }

  /** S8: model persistence — online LDA yields a LocalLDAModel dir. */
  def save(model: LDAModel, dir: String): Unit = model.write.overwrite().save(dir)
  def load(dir: String): LDAModel =
    org.apache.spark.ml.clustering.LocalLDAModel.load(dir)

  /** Per-document (topicId, probability) pairs with prob > threshold
    * (reference `ihop/clustering.py:966-1015`). */
  def documentTopics(model: LDAModel, df: DataFrame, idCol: String,
                     minProb: Double = 0.0): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(df)
      .select(col(idCol),
        posexplode(vector_to_array(col("topicDistribution"))).as(Seq("topic", "prob")))
      .where(col("prob") > minProb)
  }
}
