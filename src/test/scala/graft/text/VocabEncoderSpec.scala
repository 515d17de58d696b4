package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Vocab fit (frequency rank, deterministic ties, minCount cut) and
  * order-preserving id encoding with the OOV fallback. */
class VocabEncoderSpec extends SparkSpec {
  import spark.implicits._

  // counts: b→4, a→3, c→2, z→1
  private def corpus = Seq(
    (1L, Seq("a", "b", "a", "b")),
    (2L, Seq("b", "c", "z", "b")),
    (3L, Seq("c", "a")),
    (4L, Seq.empty[String])).toDF("doc_id", "t")

  test("fit ranks by count desc with token-text ties, cuts at minCount") {
    val v = VocabEncoder.fit(corpus, "t", minCount = 2L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("b" -> 1L, "a" -> 2L, "c" -> 3L)) // z cut at minCount=2
  }

  test("tied counts rank by token text deterministically") {
    val tied = Seq((1L, Seq("y", "x"))).toDF("doc_id", "t")
    val v = VocabEncoder.fit(tied, "t", minCount = 1L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("x" -> 1L, "y" -> 2L))
  }

  test("encode preserves token order, maps OOV to 0, keeps empty docs") {
    val v = VocabEncoder.fit(corpus, "t", minCount = 2L)
    val got = VocabEncoder.encode(v, corpus, "doc_id", "t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((4L, 0L, "2,1,2,1")))
    assert(got(2L) == ((4L, 1L, "1,3,0,1"))) // z → OOV 0, in place
    assert(got(3L) == ((2L, 0L, "3,2")))
    assert(got(4L) == ((0L, 0L, "")))
  }

  test("encoding a corpus against a foreign vocab OOVs every unseen token") {
    val v = VocabEncoder.fit(corpus, "t", minCount = 2L)
    val target = Seq((9L, Seq("q", "b", "q"))).toDF("doc_id", "t")
    val got = VocabEncoder.encode(v, target, "doc_id", "t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(9L) == ((3L, 2L, "0,1,0")))
  }
}
