package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, RegexTokenizer, StopWordsRemover}
import org.apache.spark.sql.DataFrame

/** Spark ML text pipeline (SURVEY.md §2.9, M1–M5).
  *
  * tokenize → (stop words) → count-vectorize → (IDF), mirroring the
  * reference's `SparkTextPreprocessingPipeline`
  * (reference `ihop/text_processing.py:300-424`): same stages, same
  * defaults, same column names.
  */
object TextPipeline {

  /** The reference's token pattern (`ihop/text_processing.py:315`):
    * matches tokens (gaps=false); keeps `#hashtag`, `@mention`,
    * `yo-yo`, `some.one@email.com`; drops bare punctuation. */
  val TokenPattern: String =
    "([\\p{L}\\p{N}#@][\\p{L}\\p{N}\\p{Pd}\\p{Pc}\\p{S}\\p{P}]*[\\p{L}\\p{N}])|[\\p{L}\\p{N}]|[^\\p{P}\\s]"

  /** Defaults from reference `ihop/text_processing.py:320-324`. */
  final case class Config(
      inputCol: String = "document_text",
      tokenizedCol: String = "tokenized",
      noStopCol: String = "tokensNoStopWords",
      vectorizedCol: String = "vectorized",
      minDF: Double = 0.05,
      maxDF: Double = 0.95,
      minTF: Double = 0.0,
      vocabSize: Int = 262144,
      binary: Boolean = false,
      stopLanguage: Option[String] = Some("english"),
      useIdf: Boolean = false)

  /** Build the (unfitted) pipeline with the reference's stage layout. */
  def build(cfg: Config = Config()): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(cfg.inputCol).setOutputCol(cfg.tokenizedCol)
      .setPattern(TokenPattern).setGaps(false).setToLowercase(true)

    val stopStage = cfg.stopLanguage.map { lang =>
      new StopWordsRemover()
        .setInputCol(cfg.tokenizedCol).setOutputCol(cfg.noStopCol)
        .setStopWords(StopWordsRemover.loadDefaultStopWords(lang))
        .setCaseSensitive(false)
    }
    val countVecInput = if (stopStage.isDefined) cfg.noStopCol else cfg.tokenizedCol

    // when IDF is on, CountVectorizer writes `count_vectorized` and IDF
    // produces the final `vectorized` (reference `ihop/text_processing.py:393-402`)
    val cvOut = if (cfg.useIdf) "count_vectorized" else cfg.vectorizedCol
    val countVec = new CountVectorizer()
      .setInputCol(countVecInput).setOutputCol(cvOut)
      .setMinDF(cfg.minDF).setMaxDF(cfg.maxDF).setMinTF(cfg.minTF)
      .setVocabSize(cfg.vocabSize).setBinary(cfg.binary)

    val idfStage = if (cfg.useIdf)
      Seq(new IDF().setInputCol(cvOut).setOutputCol(cfg.vectorizedCol))
    else Seq.empty

    new Pipeline().setStages(
      (Seq(tokenizer) ++ stopStage.toSeq ++ Seq(countVec) ++ idfStage).toArray)
  }

  def fitTransform(df: DataFrame, cfg: Config = Config()): (PipelineModel, DataFrame) = {
    val model = build(cfg).fit(df)
    (model, model.transform(df))
  }

  /** id → word index from the fitted CountVectorizer vocabulary
    * (reference `ihop/text_processing.py:426-436`). */
  def vocabulary(model: PipelineModel): Array[String] =
    model.stages.collectFirst { case m: CountVectorizerModel => m.vocabulary }
      .getOrElse(Array.empty)

  def save(model: PipelineModel, dir: String): Unit = model.write.overwrite().save(dir)
  def load(dir: String): PipelineModel = PipelineModel.load(dir)
}
