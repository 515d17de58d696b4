package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the round-13 curation/analytics operators:
  * session path mining, t-closeness, and the lossless set-similarity
  * join. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- SessionPaths ------------------------------------------------
  test("session paths: gap segmentation, intra-session order, top-N ties") {
    // user 1: v@0, c@1, [gap] v@100; user 2: v@0, c@1; user 3: c@5, v@6
    val ev = Seq(
      (1L, 1L, 0L, "v"), (1L, 2L, 1L, "c"), (1L, 3L, 100L, "v"),
      (2L, 4L, 0L, "v"), (2L, 5L, 1L, "c"),
      (3L, 6L, 5L, "c"), (3L, 7L, 6L, "v"))
      .toDF("user_id", "event_id", "ts_ms", "event_type")
    val out = SessionPaths.topPaths(ev, "user_id", col("ts_ms"), "event_id",
        "event_type", gapMs = 10L, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // paths: v>c ×2 (users 1+2), v ×1 (user 1 second session), c>v ×1
    assert(out == Seq(("v>c", 2L), ("c>v", 1L), ("v", 1L)))
  }

  test("session paths: equal-ts events order by the tie column") {
    val ev = Seq((1L, 2L, 0L, "b"), (1L, 1L, 0L, "a"))
      .toDF("user_id", "event_id", "ts_ms", "event_type")
    val out = SessionPaths.topPaths(ev, "user_id", col("ts_ms"), "event_id",
        "event_type", 10L, 5).collect().map(_.getString(0)).toSeq
    assert(out == Seq("a>b"))
  }

  // --- t-closeness -------------------------------------------------
  test("t-closeness: a group matching the global distribution scores 0") {
    // both groups 50/50 over sv {0,1} — EMD 0 everywhere
    val t = Seq(("g1", 0L), ("g1", 1L), ("g2", 0L), ("g2", 1L))
      .toDF("qi", "sv")
    val out = Privacy.tClosenessAudit(t, Seq("qi"), "sv", tMilli = 200L)
      .orderBy(col("qi")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(("g1", 2L, 0L, 0L), ("g2", 2L, 0L, 0L)))
  }

  test("t-closeness: a fully-skewed group scores the closed-form EMD") {
    // global over sv {0,1}: 3 vs 1 (N=4, m=2); group g1 all at 0
    // EMD(g1) = |1 - 0.75| = 0.25 → 250000 micro; risky at t=0.2
    // EMD(g2) = |0.5 - 0.75| = 0.25 → also 250000 (complementary skew)
    val t = Seq(("g1", 0L), ("g1", 0L), ("g2", 0L), ("g2", 1L))
      .toDF("qi", "sv")
    val out = Privacy.tClosenessAudit(t, Seq("qi"), "sv", tMilli = 200L)
      .orderBy(col("qi")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(("g1", 2L, 250000L, 1L), ("g2", 2L, 250000L, 1L)))
  }

  test("t-closeness: single sensitive value reads EMD 0 (m <= 1)") {
    val t = Seq(("g1", 7L), ("g2", 7L)).toDF("qi", "sv")
    val out = Privacy.tClosenessAudit(t, Seq("qi"), "sv", 200L)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(out.forall(_ == (0L, 0L)))
  }

  // --- SetSimJoin --------------------------------------------------
  private def naiveJaccard(docs: Seq[(Long, String)], k: Int,
                           tauMilli: Long): Seq[(Long, Long, Long, Long, Long)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
      if (toks.length < k) Set.empty
      else toks.sliding(k).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => (id, shingles(t)) }
      .filter(_._2.nonEmpty)
    for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong if inter > 0
      un = (sa | sb).size.toLong
      if inter * 1000 >= tauMilli * un
    } yield (a, b, inter, un, inter * 1000 / un)
  }

  test("set-similarity join: closed-form pair") {
    // 1-shingles: {a,b,c,d} vs {a,b,c,e}: inter 3, union 5, jac 600
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = SetSimJoin.jaccardJoin(docs, "doc_id", "text",
        shingleK = 1, tauMilli = 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq((1L, 2L, 3L, 5L, 600L)))
    graft.Caches.release()
  }

  test("set-similarity join: prefix filtering is lossless vs brute force") {
    // family of overlapping token docs incl. near-identical, disjoint,
    // and subset shapes, at two thresholds and two shingle widths
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "the quick brown fox leaps over the lazy dog",
      4L -> "pack my box with five dozen liquor jugs",
      5L -> "pack my box with five dozen liquor jugs today",
      6L -> "the quick brown fox",
      7L -> "completely different content entirely here now")
    for (k <- Seq(1, 3); tau <- Seq(300L, 600L)) {
      val got = SetSimJoin.jaccardJoin(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingleK = k, tauMilli = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq.sorted
      assert(got == naiveJaccard(docs, k, tau).sorted, s"k=$k tau=$tau")
      graft.Caches.release()
    }
  }
}
