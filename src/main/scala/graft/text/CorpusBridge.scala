package graft.text

import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side corpus bridges (SURVEY.md §2.10 X18; reference
  * `collect_column_to_list` / `SparkCorpusIterator`,
  * `ihop/text_processing.py:130-144,256-298`): reshape a vectorized
  * column into gensim-style `(termIndex, count)` tuples, either fully
  * collected or as a streaming local iterator (bounded driver memory —
  * the reference uses exactly this shape to feed gensim LDA). */
object CorpusBridge {
  import scala.jdk.CollectionConverters._

  private def reshape(v: Vector): Seq[(Int, Double)] = v match {
    case s: SparseVector => s.indices.zip(s.values).toIndexedSeq
    case d => d.toArray.zipWithIndex.collect { case (x, i) if x != 0 => (i, x) }.toIndexedSeq
  }

  /** Collect the whole column (small corpora only). */
  def collectVectorized(df: DataFrame, vecCol: String): Seq[Seq[(Int, Double)]] =
    df.select(vecCol).collect().toSeq
      .map((r: Row) => reshape(r.getAs[Vector](0)))

  /** Streaming variant: one partition in memory at a time. */
  def iterateVectorized(df: DataFrame, vecCol: String): Iterator[Seq[(Int, Double)]] =
    df.select(vecCol).toLocalIterator()
      .asInstanceOf[java.util.Iterator[Row]]
      .asScala.map(r => reshape(r.getAs[Vector](0)))
}
