package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25: corpus stats, the exact scaled scoring formula, rank and tie
  * order, and the no-term exclusion rule. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // dl: 1→4, 2→3, 3→2, 4→3; N=4, nTokens=12, avgdl=3
  private def corpus = Seq(
    (1L, Seq("spark", "hash", "hash", "join")),
    (2L, Seq("hash", "scan", "scan")),
    (3L, Seq("sort", "merge")),
    (4L, Seq("join", "join", "spark"))).toDF("doc_id", "t")

  private def expectedTerm(tf: Long, df: Long, dl: Long,
                           nd: Long, nt: Long): Long = {
    val idf = math.log(1.0 + (nd.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
    val tfn = (tf.toDouble * 2.2) /
      (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / (nt.toDouble / nd.toDouble))))
    math.floor(1000000.0 * idf * tfn).toLong
  }

  test("fit: df over distinct doc-term pairs, corpus scalars") {
    val s = Bm25.fit(corpus, "doc_id", "t")
    assert(s.nDocs == 4 && s.nTokens == 12)
    val df = s.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("spark" -> 2L, "hash" -> 2L, "join" -> 2L,
      "scan" -> 1L, "sort" -> 1L, "merge" -> 1L))
  }

  test("topKScaled matches the hand-evaluated formula and excludes no-term docs") {
    val s = Bm25.fit(corpus, "doc_id", "t")
    val got = Bm25.topKScaled(s, corpus, "doc_id", "t",
      Seq(0L -> Seq("hash", "join")), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 3 has neither term → absent
    assert(got.map(_._3).toSet == Set(1L, 2L, 4L))
    val expect = Map(
      1L -> (expectedTerm(2, 2, 4, 4, 12) + expectedTerm(1, 2, 4, 4, 12)),
      2L -> expectedTerm(1, 2, 3, 4, 12),
      4L -> expectedTerm(2, 2, 3, 4, 12))
    val scores = got.map(r => r._3 -> r._4).toMap
    assert(scores == expect, s"got $scores expect $expect")
    // ranks follow score desc, doc_id ties
    val ranked = got.sortBy(_._2).map(_._3).toSeq
    val byScore = expect.toSeq.sortBy { case (id, sc) => (-sc, id) }.map(_._1)
    assert(ranked == byScore)
  }

  test("k truncates the ranking per query independently") {
    val s = Bm25.fit(corpus, "doc_id", "t")
    val got = Bm25.topKScaled(s, corpus, "doc_id", "t",
      Seq(0L -> Seq("hash"), 1L -> Seq("join", "spark")), k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 2 && got.toMap.keySet == Set(0L, 1L))
    intercept[IllegalArgumentException](
      Bm25.topKScaled(s, corpus, "doc_id", "t", Seq(0L -> Seq("hash")), k = 0))
  }
}
