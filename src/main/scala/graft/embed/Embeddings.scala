package graft.embed

import org.apache.spark.ml.feature.{Word2Vec, Word2VecModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Community embeddings (SURVEY.md §2.10 X1–X5).
  *
  * The reference trains gensim word2vec SGNS over per-user subreddit
  * "sentences" (`ihop/community2vec.py:157-276`) with the window sized
  * to the longest context (effectively unlimited). Our engine uses
  * Spark ML `Word2Vec` — same output contract (word → vector table,
  * nearest neighbors, analogy accuracy); the training algorithm is
  * skip-gram + hierarchical softmax rather than negative sampling, a
  * documented divergence (SURVEY.md §7.4.1), not chased to bit-parity.
  */
object Embeddings {

  /** Defaults mirror reference `ihop/community2vec.py:157-218`. */
  final case class Config(
      vectorSize: Int = 150,
      epochs: Int = 5,
      alpha: Double = 0.025,
      minCount: Int = 0,
      windowSize: Int = 1000, // "unlimited" — set to max context length
      numPartitions: Int = 1,
      seed: Long = 1L,
      contextCol: String = "context_words")

  def train(df: DataFrame, cfg: Config = Config()): Word2VecModel =
    new Word2Vec()
      .setInputCol(cfg.contextCol).setOutputCol("w2v_vec")
      .setVectorSize(cfg.vectorSize).setMaxIter(cfg.epochs)
      .setStepSize(cfg.alpha).setMinCount(cfg.minCount)
      .setWindowSize(cfg.windowSize).setNumPartitions(cfg.numPartitions)
      .setSeed(cfg.seed)
      .fit(df)

  /** word → vector table (the gensim KeyedVectors equivalent). */
  def vectors(model: Word2VecModel): DataFrame = model.getVectors

  /** Collected (word, embedding) pairs for driver-side evaluation.
    * NOTE: Spark ML exposes no word frequencies, so the order is NOT
    * gensim's frequency order — callers applying a `restrictVocab`
    * truncation must supply frequency-ordered vectors themselves (or
    * pass restrictVocab = vecs.size to disable truncation). */
  def collectVectors(model: Word2VecModel): Seq[(String, Array[Float])] =
    model.getVectors.collect()
      .map(r => r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1)
        .toArray.map(_.toFloat)).toSeq

  /** S8: model persistence. */
  def save(model: Word2VecModel, dir: String): Unit = model.write.overwrite().save(dir)
  def load(dir: String): Word2VecModel = Word2VecModel.load(dir)

  /** X4: nearest neighbors by cosine — Spark ML built-in. */
  def neighbors(model: Word2VecModel, term: String, n: Int): DataFrame =
    model.findSynonyms(term, n)

  // ------------------------------------------------------------ analogies

  /** One analogy question a:b :: c:?, expected answer d, under an
    * optional section label (gensim sectioned file format). */
  final case class Analogy(section: String, a: String, b: String, c: String, d: String)

  final case class SectionScore(section: String, correct: Long, total: Long) {
    def accuracy: Double = if (total == 0) 0.0 else correct.toDouble / total
  }
  final case class AnalogyResult(overall: Double, solvable: Long,
                                 sections: Seq[SectionScore])

  /** X3: 3CosAdd analogy accuracy, gensim semantics
    * (reference `ihop/community2vec.py:307-328`): restrict to the
    * `restrictVocab` most-frequent words, skip questions with any OOV
    * term, argmax cosine(v, b - a + c) over the restricted vocab
    * excluding {a, b, c}; P@1 over solvable questions; per-section
    * detail. Driver-side BLAS over the collected matrix — the vocab is
    * ~10k × 100 floats, trivially driver-sized (SURVEY.md §2.10 X3);
    * the distributed alternative is a broadcast cross-join scoring the
    * same argmax.
    *
    * @param vecs    word → embedding, in frequency order (most frequent
    *                first) when `restrictVocab` is used.
    */
  def evaluateAnalogies(vecs: Seq[(String, Array[Float])],
                        analogies: Seq[Analogy],
                        restrictVocab: Int = 10000,
                        caseInsensitive: Boolean = false): AnalogyResult = {
    val restricted = vecs.take(restrictVocab)
    def key(w: String) = if (caseInsensitive) w.toLowerCase else w
    val index = restricted.map { case (w, v) => key(w) -> v }.toMap
    val words = restricted.map(_._1).toArray
    val unit = restricted.map { case (_, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n == 0) v.map(_.toDouble) else v.map(_ / n)
    }.toArray

    val bySection = analogies.groupBy(_.section)
    val sections = bySection.toSeq.sortBy(_._1).map { case (sec, qs) =>
      var correct = 0L; var total = 0L
      qs.foreach { q =>
        (index.get(key(q.a)), index.get(key(q.b)), index.get(key(q.c)),
          index.get(key(q.d))) match {
          case (Some(va), Some(vb), Some(vc), Some(_)) =>
            total += 1
            val target = norm1(sub(add(norm(vb), norm(vc)), norm(va)))
            val exclude = Set(key(q.a), key(q.b), key(q.c))
            var best = -1; var bestScore = Double.MinValue
            var i = 0
            while (i < words.length) {
              if (!exclude.contains(key(words(i)))) {
                val s = dot(unit(i), target)
                if (s > bestScore) { bestScore = s; best = i }
              }
              i += 1
            }
            if (best >= 0 && key(words(best)) == key(q.d)) correct += 1
          case _ => // unsolvable: some term OOV — skipped (gensim semantics)
        }
      }
      SectionScore(sec, correct, total)
    }
    val correct = sections.map(_.correct).sum
    val total = sections.map(_.total).sum
    AnalogyResult(if (total == 0) 0.0 else correct.toDouble / total, total, sections)
  }

  private def norm(v: Array[Float]): Array[Double] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0) v.map(_.toDouble) else v.map(_ / n)
  }
  private def norm1(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }
  private def add(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => t._1 + t._2)
  private def sub(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => t._1 - t._2)
  private def dot(a: Array[Double], b: Array[Double]) = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Parse gensim sectioned analogy text (`: section` headers then
    * whitespace 4-tuples — reference `ihop/resources/analogies`). */
  def parseAnalogyFile(lines: Iterator[String]): Seq[Analogy] = {
    var section = "default"
    val out = Seq.newBuilder[Analogy]
    lines.foreach { line =>
      val t = line.trim
      if (t.startsWith(":")) section = t.drop(1).trim
      else if (t.nonEmpty) t.split("\\s+") match {
        case Array(a, b, c, d) => out += Analogy(section, a, b, c, d)
        case _ =>
      }
    }
    out.result()
  }

  /** Analogy 4-tuples from a pair CSV (rows `a,b`): all cross-row
    * combinations (reference `ihop/resources/analogies/__init__.py:7-22`). */
  def analogiesFromPairs(pairs: Seq[(String, String)], section: String): Seq[Analogy] =
    for {
      (a, b) <- pairs; (c, d) <- pairs if (a, b) != (c, d)
    } yield Analogy(section, a, b, c, d)

  // ----------------------------------------------------------- grid search

  final case class GridResult(params: Map[String, String], accuracy: Double,
                              model: Word2VecModel)

  /** X5: cartesian grid-search trainer — train each configuration,
    * score on analogies, keep the best (ties → later config, matching
    * the reference's `acc >= best_acc` update rule,
    * `ihop/community2vec.py:476-505`). Pure driver orchestration. */
  def gridSearch(spark: SparkSession, df: DataFrame,
                 base: Config,
                 alphas: Seq[Double], vectorSizes: Seq[Int],
                 analogies: Seq[Analogy]): (GridResult, Seq[GridResult]) = {
    val results = for (a <- alphas; vs <- vectorSizes) yield {
      val cfg = base.copy(alpha = a, vectorSize = vs)
      val m = train(df, cfg)
      val vecs = collectVectors(m)
      val acc = evaluateAnalogies(vecs, analogies, restrictVocab = vecs.size).overall
      GridResult(Map("alpha" -> a.toString, "vectorSize" -> vs.toString), acc, m)
    }
    (results.reduceLeft((b, r) => if (r.accuracy >= b.accuracy) r else b), results)
  }
}
