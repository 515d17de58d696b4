package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram LM perplexity filter: counts, Laplace smoothing, the exact
  * integer scaling, the OOV path, and the filter inequality — all
  * against hand-computed values. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "a b a b", "a b c", "c" → bigrams: (a,b)×3 (two in doc 1,
  // one in doc 2), (b,a), (b,c); vocab {a,b,c} = 3; c1: a→3, b→2
  private def corpus = Seq(
    (1L, Seq("a", "b", "a", "b")),
    (2L, Seq("a", "b", "c")),
    (3L, Seq("c"))).toDF("doc_id", "t")

  test("fit: bigram counts, prev counts, vocab size") {
    val m = NgramLm.fit(corpus, "doc_id", "t")
    assert(m.vocabSize == 3)
    val bc = m.bigramCounts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bc == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    val pc = m.prevCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pc == Map("a" -> 3L, "b" -> 2L))
  }

  private def t(c2: Long, c1: Long, v: Long): Long =
    math.floor(1000000.0 * math.log((c2 + 1.0) / (c1 + v.toDouble))).toLong

  test("scoreScaled: hand-computed smoothed terms; bigram-less doc scores (0,0)") {
    val m = NgramLm.fit(corpus, "doc_id", "t")
    val got = NgramLm.scoreScaled(m, corpus, "doc_id", "t").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: (a,b) (b,a) (a,b) → t(3,3,3)*2 + t(1,2,3)
    assert(got(1L) == ((3L, 2 * t(3, 3, 3) + t(1, 2, 3))))
    // doc 2: (a,b) (b,c) → t(3,3,3) + t(1,2,3)
    assert(got(2L) == ((2L, t(3, 3, 3) + t(1, 2, 3))))
    assert(got(3L) == ((0L, 0L)))
  }

  test("OOV words fall through to the pure-smoothing path 1/|V|") {
    val m = NgramLm.fit(corpus, "doc_id", "t")
    val target = Seq((9L, Seq("z", "q"))).toDF("doc_id", "t")
    val got = NgramLm.scoreScaled(m, target, "doc_id", "t").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // unseen prev AND pair: (0+1)/(0+3)
    assert(got(9L) == ((1L, t(0, 0, 3))))
  }

  test("perplexityFilter keeps high-probability docs and bigram-less docs") {
    val m = NgramLm.fit(corpus, "doc_id", "t")
    // doc 1 avg = (2*t(3,3,3)+t(1,2,3))/3; doc 2 avg is lower (worse).
    val mid = (2 * t(3, 3, 3) + t(1, 2, 3)) / 3
    val kept = NgramLm.perplexityFilter(m, corpus, "doc_id", "t", mid - 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L), "best doc must survive")
    assert(kept.contains(3L), "bigram-less doc must survive")
    assert(!kept.contains(2L), "below-threshold doc must be dropped")
  }

  test("scoring plan: token-level joins are shuffle/broadcast hash joins, no nested loops") {
    val m = NgramLm.fit(corpus, "doc_id", "t")
    val plan = NgramLm.scoreScaled(m, corpus, "doc_id", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
