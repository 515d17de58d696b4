package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the round-14 model-eval / drift family:
  * rank statistics (Spearman, Mann–Whitney, AUC, Kendall), drift tests
  * (KS, chi-squared, PSI), calibration (reliability bins, PR sweep),
  * retrieval eval + RRF fusion, time-series diagnostics (CUSUM,
  * autocorrelation, seasonality), and the zone-map skip audit. */
class AnalyticsOps14Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ Spearman

  test("spearman: perfect monotone is exactly +1e6, inverse exactly -1e6") {
    val up = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L),
      ("g", 4L, 45L)).toDF("k", "x", "y")
    val r1 = RankStats.spearmanByGroup(up, "k", col("x"), col("y"))
      .head()
    assert(r1.getLong(1) == 4L && r1.getLong(2) == 1000000L)
    val down = Seq(("g", 1L, 40L), ("g", 2L, 30L), ("g", 3L, 20L),
      ("g", 4L, 10L)).toDF("k", "x", "y")
    val r2 = RankStats.spearmanByGroup(down, "k", col("x"), col("y"))
      .head()
    assert(r2.getLong(2) == -1000000L)
  }

  test("spearman: midrank tie handling matches the closed form") {
    // x = (1,2,2,3), y = (1,2,3,4): rank2(x) = (2,5,5,8), rank2(y) =
    // (2,4,6,8). n=4: sx=20 sy=20 sxy=118 sxx=118 syy=120;
    // num = 4*118-400 = 72; dx = 72; dy = 80;
    // rho = 72/sqrt(5760) = 0.948683... -> 948683 micro
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 2L, 3L),
      ("g", 3L, 4L)).toDF("k", "x", "y")
    val r = RankStats.spearmanByGroup(df, "k", col("x"), col("y")).head()
    assert(r.getLong(2) == 948683L)
  }

  // -------------------------------------------------------- Mann–Whitney

  test("mann-whitney: disjoint sides give U=0/max and the U identity holds") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L), ("b", 12L))
      .toDF("s", "v")
    val r = RankStats.mannWhitneyPairs(df, "s", col("v")).head()
    // side a entirely below b: U_a = 0, U_b = n_a*n_b
    assert((r.getLong(2), r.getLong(3)) == ((2L, 3L)))
    assert(r.getLong(4) == 0L && r.getLong(5) == 12L) // u2_b = 2*2*3
    assert(r.getLong(6) == 0L)                        // cle_micro
    // identity: u2_a + u2_b == 2 * n_a * n_b
    assert(r.getLong(4) + r.getLong(5) == 2L * r.getLong(2) * r.getLong(3))
  }

  test("mann-whitney: a value on only one side still shifts the ranking") {
    // a = {1, 5}, b = {3}: without the one-side value 5 in the union
    // grid, b's rank would be wrong. rank2: 1->2, 3->4, 5->6.
    // R2_a = 2+6 = 8, U2_a = 8 - 2*3 = 2 (a>b once out of two: U_a=1)
    val df = Seq(("a", 1L), ("a", 5L), ("b", 3L)).toDF("s", "v")
    val r = RankStats.mannWhitneyPairs(df, "s", col("v")).head()
    assert(r.getLong(4) == 2L && r.getLong(6) == 500000L)
  }

  test("mann-whitney: all-tied sides read exactly CLE 0.5") {
    val df = Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("s", "v")
    val r = RankStats.mannWhitneyPairs(df, "s", col("v")).head()
    assert(r.getLong(6) == 500000L)
  }

  // ----------------------------------------------------------------- AUC

  test("auc: perfect separation 1e6, all-tied 0.5, single class -1") {
    val perfect = Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 9L, 1L),
      ("g", 10L, 1L)).toDF("k", "v", "y")
    assert(RankStats.aucByGroup(perfect, "k", col("v"), col("y"))
      .head().getLong(3) == 1000000L)
    val tied = Seq(("g", 5L, 0L), ("g", 5L, 1L), ("g", 5L, 0L))
      .toDF("k", "v", "y")
    assert(RankStats.aucByGroup(tied, "k", col("v"), col("y"))
      .head().getLong(3) == 500000L)
    val mono = Seq(("g", 1L, 1L), ("g", 2L, 1L)).toDF("k", "v", "y")
    assert(RankStats.aucByGroup(mono, "k", col("v"), col("y"))
      .head().getLong(3) == -1L)
  }

  test("auc: reversed scores give exactly 0") {
    val df = Seq(("g", 9L, 0L), ("g", 10L, 0L), ("g", 1L, 1L),
      ("g", 2L, 1L)).toDF("k", "v", "y")
    assert(RankStats.aucByGroup(df, "k", col("v"), col("y"))
      .head().getLong(3) == 0L)
  }

  // -------------------------------------------------------------- Kendall

  test("kendall: perfect concordance +1e6, perfect discordance -1e6") {
    val up = Seq(("g", 1L, 1L, 10L), ("g", 2L, 2L, 20L), ("g", 3L, 3L, 30L))
      .toDF("k", "id", "x", "y")
    val r1 = RankStats.kendallByGroup(up, "k", "id", col("x"), col("y"),
      cap = 100L).head()
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 3L &&
      r1.getLong(3) == 1000000L)
    val down = Seq(("g", 1L, 1L, 30L), ("g", 2L, 2L, 20L), ("g", 3L, 3L, 10L))
      .toDF("k", "id", "x", "y")
    assert(RankStats.kendallByGroup(down, "k", "id", col("x"), col("y"),
      cap = 100L).head().getLong(3) == -1000000L)
  }

  test("kendall: tau-b tie correction matches the closed form") {
    // x = (1,1,2), y = (1,2,3): pairs (12):x-tie, (13):+1, (23):+1
    // nc-nd = 2, n0 = 3, tx = 1, ty = 0:
    // tau_b = 2/sqrt(2*3) = 0.8164.. -> 816496 micro
    val df = Seq(("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 3L, 2L, 3L))
      .toDF("k", "id", "x", "y")
    val r = RankStats.kendallByGroup(df, "k", "id", col("x"), col("y"),
      cap = 100L).head()
    assert(r.getLong(2) == 2L && r.getLong(3) == 816496L)
  }

  // ------------------------------------------------------------------ KS

  test("ks: disjoint distributions read D=1000 milli, identical read 0") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L),
      ("c", 1L), ("c", 2L)).toDF("s", "v")
    val out = DriftStats.ksPairs(df, "s", col("v"))
      .orderBy("side_a", "side_b").collect()
    val ab = out(0); val ac = out(1)
    assert(ab.getString(0) == "a" && ab.getString(1) == "b" &&
      ab.getLong(5) == 1000L)
    assert(ac.getString(0) == "a" && ac.getString(1) == "c" &&
      ac.getLong(4) == 0L && ac.getLong(5) == 0L)
  }

  test("ks: the gap at a one-side-only value is counted") {
    // a = {1, 3}, b = {2}: at v=1 |1*1 - 0*2| = 1; at v=2 |1*1-1*2|=1;
    // ks_num = 1 -> D = 0.5
    val df = Seq(("a", 1L), ("a", 3L), ("b", 2L)).toDF("s", "v")
    val r = DriftStats.ksPairs(df, "s", col("v")).head()
    assert(r.getLong(4) == 1L && r.getLong(5) == 500L)
  }

  // ----------------------------------------------------------- chi-squared

  test("chi-squared: independent uniform table has zero terms, df 1") {
    val df = Seq.tabulate(20)(i =>
      (if (i % 2 == 0) "r1" else "r2", if (i % 4 < 2) "c1" else "c2"))
      .toDF("r", "c")
    val cells = DriftStats.chiSqCells(df, "r", "c")
    assert(cells.collect().forall(r => r.getLong(4) == 0L))
    val tot = DriftStats.chiSqTotal(cells).head()
    assert(tot.getLong(0) == 0L && tot.getLong(1) == 4L &&
      tot.getLong(2) == 1L)
  }

  test("chi-squared: a fully coupled 2x2 reads the observed-cell sum") {
    // perfect association: full chi2 = N = 8, of which the two OBSERVED
    // cells contribute (4*8-16)^2/(16*8) = 2 each (the two never-seen
    // cells' E = 2 each are outside the observed-cell table by the
    // documented contract) -> 4e6 micro over n_cells = 2, df = 1
    val df = (Seq.fill(4)(("r1", "c1")) ++ Seq.fill(4)(("r2", "c2")))
      .toDF("r", "c")
    val tot = DriftStats.chiSqTotal(DriftStats.chiSqCells(df, "r", "c"))
      .head()
    assert(tot.getLong(0) == 4000000L && tot.getLong(1) == 2L &&
      tot.getLong(2) == 1L)
  }

  // ----------------------------------------------------------------- PSI

  test("psi: a side matching the global mix reads exactly 0") {
    val df = (Seq.fill(4)(("a", 0L)) ++ Seq.fill(4)(("a", 1L)) ++
      Seq.fill(4)(("b", 0L)) ++ Seq.fill(4)(("b", 1L))).toDF("s", "b")
    val out = DriftStats.psiBySide(df, "s", col("b")).collect()
    // (side, n_side, n_novel, psi_micro): no novel mass, psi exactly 0
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("psi: a zero-count side bucket takes the pseudo-count, psi > 0") {
    val df = (Seq.fill(8)(("a", 0L)) ++ Seq.fill(4)(("b", 0L)) ++
      Seq.fill(4)(("b", 1L))).toDF("s", "b")
    val out = DriftStats.psiBySide(df, "s", col("b"))
      .orderBy("side").collect()
    assert(out(0).getLong(3) > 0L) // side a misses bucket 1 entirely
  }

  // ----------------------------------------------------------- calibration

  test("reliability bins: per-bin confidence/accuracy/gap closed form") {
    val df = Seq((450L, 0L), (550L, 1L), (555L, 1L)).toDF("p", "y")
    val out = Calibration.reliabilityBins(df, col("p"), col("y"), bins = 10)
      .orderBy("bin").collect()
    assert(out(0).getLong(0) == 4L && out(0).getLong(2) == 450L &&
      out(0).getLong(3) == 0L && out(0).getLong(4) == 450L)
    assert(out(1).getLong(0) == 5L && out(1).getLong(1) == 2L &&
      out(1).getLong(2) == 552L && out(1).getLong(3) == 1000L)
  }

  test("reliability bins: milli-prob 1000 lands in the top bin") {
    val df = Seq((1000L, 1L)).toDF("p", "y")
    val out = Calibration.reliabilityBins(df, col("p"), col("y"), bins = 10)
      .head()
    assert(out.getLong(0) == 9L && out.getLong(4) == 0L)
  }

  test("pr sweep: integer-pure F1 at each operating point") {
    val df = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("v", "y")
    val out = Calibration.prSweep(df, col("v"), col("y"), Seq(2L, 4L))
      .orderBy("threshold").collect()
    val t2 = out(0)
    assert(t2.getLong(1) == 2L && t2.getLong(2) == 1L && t2.getLong(3) == 0L)
    assert(t2.getLong(4) == 666L && t2.getLong(5) == 1000L &&
      t2.getLong(6) == 800L)
    val t4 = out(1)
    assert(t4.getLong(1) == 1L && t4.getLong(4) == 1000L &&
      t4.getLong(5) == 500L && t4.getLong(6) == 666L)
  }

  // ------------------------------------------------------- retrieval eval

  test("evalRun: MRR/hit/precision closed form, no-relevant reads zeros") {
    val run = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "x")).toDF("qid", "rank", "doc")
    val truth = Seq((1L, "b")).toDF("qid", "doc")
    val out = RetrievalEval.evalRun(run, truth, "qid", "doc", "rank", k = 3)
      .orderBy("qid").collect()
    val q1 = out(0)
    assert(q1.getLong(1) == 3L && q1.getLong(2) == 1L &&
      q1.getLong(3) == 2L && q1.getLong(4) == 500000L &&
      q1.getLong(5) == 0L && q1.getLong(6) == 1L && q1.getLong(7) == 333L)
    val q2 = out(1)
    assert(q2.getLong(3) == 0L && q2.getLong(4) == 0L && q2.getLong(7) == 0L)
  }

  test("rrfFuse: truncated-run fusion sums 1e9 DIV (60+rank)") {
    val r1 = Seq((1L, "d1", 1L), (1L, "d2", 2L)).toDF("qid", "doc", "rank")
    val r2 = Seq((1L, "d2", 1L), (1L, "d3", 2L)).toDF("qid", "doc", "rank")
    val out = RetrievalEval.rrfFuse(Seq(r1, r2), "qid", "doc", "rank", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("d2", "d1", "d3"))
    assert(out(0).getLong(3) == 16393442L + 16129032L &&
      out(0).getLong(4) == 2L)
    assert(out(1).getLong(3) == 16393442L && out(1).getLong(4) == 1L)
  }

  // ------------------------------------------------------------ time series

  test("cusum: windowed reflection identity matches the sequential recurrence") {
    // one key, daily xs with a level shift; mean = 60, k = 66
    val xs = Seq(50L, 55L, 45L, 50L, 80L, 90L, 50L)
    val df = xs.zipWithIndex.map { case (x, i) =>
      ("g", i.toLong * 86400000L, x)
    }.toDF("k", "p", "x")
    val out = TimeSeries.cusumDaily(df, "k", col("p"), col("x"))
      .orderBy("period_ms").collect()
    val mean = xs.sum / xs.length
    val slack = mean + mean * 10 / 100
    var c = 0L
    val ref = xs.map { x => c = math.max(0L, c + (x - slack)); c }
    assert(out.map(_.getLong(3)).toSeq == ref)
    assert(out.map(_.getLong(4)).toSeq ==
      ref.map(v => if (v > mean * 3) 1L else 0L))
  }

  test("autocorr: alternating series has lag-1 ACF exactly -1e6") {
    val df = (0 until 5).map(i =>
      ("g", i.toLong * 86400000L, if (i % 2 == 0) 0L else 1000L))
      .toDF("k", "p", "x")
    val out = TimeSeries.autocorr(df, "k", col("p"), col("x"),
      stepMs = 86400000L, lags = Seq(1, 2)).orderBy("lag").collect()
    assert(out(0).getLong(2) == 4L && out(0).getLong(3) == -1000000L)
    assert(out(1).getLong(3) == 1000000L) // lag 2 realigns: +1
  }

  test("dow seasonality: a flat series reads index 1000 on every dow") {
    val df = (0 until 14).map(i => ("g", i.toLong, 100L)).toDF("k", "d", "x")
    val out = TimeSeries.dowSeasonality(df, "k", col("d"), col("x"))
      .collect()
    assert(out.length == 7 &&
      out.forall(r => r.getLong(2) == 2L && r.getLong(3) == 100L &&
        r.getLong(4) == 1000L))
  }

  // ------------------------------------------------------- zone-map audit

  test("zone-map audit: disjoint/overlapping/empty predicates closed form") {
    val src = (0 until 20).map(i => (i.toLong / 10L, i.toLong))
      .toDF("sh", "v")
    val out = Layout.zoneMapSkipAudit(src, col("sh"), col("v"),
        Seq((0L, 9L), (5L, 14L), (100L, 200L)))
      .orderBy("pred_lo").collect()
    val p0 = out(0) // [0,9]: shard 1 ([10,19]) skipped
    assert(p0.getLong(2) == 2L && p0.getLong(3) == 1L &&
      p0.getLong(4) == 500L && p0.getLong(6) == 10L && p0.getLong(7) == 10L)
    val p5 = out(1) // [5,14]: nothing skippable, 20 scanned, 10 match
    assert(p5.getLong(3) == 0L && p5.getLong(6) == 20L &&
      p5.getLong(7) == 10L)
    val pe = out(2) // [100,200]: everything skipped, nothing matches
    assert(pe.getLong(3) == 2L && pe.getLong(6) == 0L && pe.getLong(7) == 0L)
  }

  // ----------------------------------------------------------- nDCG@k

  test("ndcg: perfect ranking reads 1000, gains discount by position") {
    // q1: relevant docs at ranks 1 and 2 of 2 total -> nDCG 1000
    val run = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"))
      .toDF("qid", "rank", "doc")
    val truth = Seq((1L, "a"), (1L, "b")).toDF("qid", "doc")
    val r = RetrievalEval.ndcgAtK(run, truth, "qid", "doc", "rank", k = 10)
      .head()
    assert(r.getLong(1) == 2L && r.getLong(4) == 1000L)
    // same relevance at ranks 2 and 3: DCG = g(2)+g(3),
    // IDCG = g(1)+g(2) -> strictly below 1000
    val run2 = Seq((1L, 1L, "c"), (1L, 2L, "a"), (1L, 3L, "b"))
      .toDF("qid", "rank", "doc")
    val r2 = RetrievalEval.ndcgAtK(run2, truth, "qid", "doc", "rank", k = 10)
      .head()
    val g = RetrievalEval.gainMicro _
    assert(r2.getLong(2) == g(2) + g(3) && r2.getLong(3) == g(1) + g(2))
    assert(r2.getLong(4) ==
      (g(2) + g(3)) * 1000L / (g(1) + g(2)) && r2.getLong(4) < 1000L)
  }

  test("ndcg: ideal fills min(k, n_rel) ranks; no-hit run reads 0") {
    // 15 relevant of which none retrieved in k=10
    val run = Seq((1L, 1L, "zz")).toDF("qid", "rank", "doc")
    val truth = (1 to 15).map(i => (1L, s"d$i")).toDF("qid", "doc")
    val r = RetrievalEval.ndcgAtK(run, truth, "qid", "doc", "rank", k = 10)
      .head()
    val idealAll = (1 to 10).map(RetrievalEval.gainMicro).sum
    assert(r.getLong(1) == 15L && r.getLong(2) == 0L &&
      r.getLong(3) == idealAll && r.getLong(4) == 0L)
  }

  // --------------------------------------------------------- QQ drift

  test("qq drift: identical side reads zero shift, shifted side reads the delta") {
    val base = (1 to 100).map(v => ("same", v.toLong)) ++
      (1 to 100).map(v => ("plus10", v.toLong + 10L))
    val df = base.toDF("s", "v")
    val out = DriftStats.qqVsGlobal(df, "s", col("v"), Seq(50))
      .orderBy("side").collect()
    // global p50 over the union; 'plus10' sits 10 above 'same'
    val plus = out(0); val same = out(1)
    assert(plus.getString(0) == "plus10" && same.getString(0) == "same")
    assert(plus.getLong(4) - same.getLong(4) == 10L)
  }

  // ------------------------------------------------------------ A/B test

  test("two-proportion: unit-grain dedup, exact lifts, z sign") {
    // variant 0: users 0,2 (0 converts twice -> counts once);
    // variant 1: users 1,3 (none converts)
    val df = Seq((0L, "p"), (0L, "p"), (2L, "v"), (1L, "v"), (3L, "v"))
      .toDF("u", "et")
    val r = Experiment.twoProportion(df, "u", expr("u % 2"),
      col("et") === "p").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 1L, 0L)))
    assert(r.getLong(4) == 500L && r.getLong(5) == 0L &&
      r.getLong(6) == 500L && r.getLong(7) == 0L) // rel lift guards /0
    assert(r.getLong(8) > 0L) // z positive: a converts more
  }

  // ------------------------------------------------------ trimmed means

  test("trimmed/winsorized means: one outlier moves the mean, not the robust pair") {
    val df = ((1 to 99).map(i => ("g", 100L)) :+ (("g", 1000000L)))
      .toDF("k", "x")
    val r = RobustStats.trimmedMeans(df, "k", col("x")).head()
    val mean = r.getLong(4); val trimmed = r.getLong(5)
    val winsor = r.getLong(6)
    assert(mean > 10000L)            // outlier drags the raw mean
    assert(trimmed == 100L)          // trimming drops it
    assert(winsor == 100L)           // clamped to p90 = 100
  }

  test("trimmed means: negative sums divide sign-factored") {
    val df = Seq(("g", -100L), ("g", -200L), ("g", -300L)).toDF("k", "x")
    val r = RobustStats.trimmedMeans(df, "k", col("x")).head()
    assert(r.getLong(4) == -200L) // sign(s) * (|s| DIV n), exact
  }

  // -------------------------------------------------------- bot score

  test("bot score: a fast narrow client flags, a slow varied one does not") {
    val bot = (0 until 30).map(i =>
      (1L, i.toLong * 100000000L, "click")) // 30 clicks in 3 s
    val human = (0 until 30).map(i =>
      (2L, i.toLong * 3600L * 1000000000L,
        Seq("view", "click", "purchase")(i % 3)))
    val df = (bot ++ human).toDF("u", "t", "ty")
    val out = Behavior.botScore(df, "u", col("t"), "ty")
      .orderBy("u").collect()
    val b = out(0)
    // span 2s, rate = 30*60000/2 = 900000 milli/min, 1 type
    assert(b.getLong(1) == 30L && b.getLong(2) == 2L &&
      b.getLong(3) == 1L && b.getLong(4) == 900000L &&
      b.getLong(6) == 1L)
    val h = out(1)
    assert(h.getLong(3) == 3L && h.getLong(6) == 0L)
  }

  // ------------------------------------------------------- Heaps' law

  test("heaps fit: all-new vocabulary reads beta exactly 1, frozen reads 0") {
    // every doc brings 2 brand-new tokens: V(N) = N -> beta = 1e6
    val fresh = (1 to 40).map(i =>
      (i.toLong, Seq(s"a$i", s"b$i"))).toDF("doc_id", "t")
    val f = VocabGrowth.heapsFit(fresh, "doc_id", "t").head()
    assert(f.getLong(6) == 1000000L)
    // one shared token forever: V = 1 at every prefix -> slope 0
    val frozen = (1 to 40).map(i =>
      (i.toLong, Seq("same", "same"))).toDF("doc_id", "t")
    val z = VocabGrowth.heapsFit(frozen, "doc_id", "t").head()
    assert(z.getLong(6) == 0L && z.getLong(3) == 1L)
  }

  test("heaps fit: samples exactly `points` evenly spaced prefixes") {
    val docs = (1 to 100).map(i => (i.toLong, Seq(s"t$i")))
      .toDF("doc_id", "t")
    val out = VocabGrowth.heapsFit(docs, "doc_id", "t", points = 10)
      .orderBy("point").collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L) &&
      out.map(_.getLong(1)).toSeq == (10L to 100L by 10L))
  }

  // -------------------------------------------------- diff-in-diff

  test("diff-in-diff: the shared trend and baseline gap cancel") {
    // variant 0: pre mean 100, post mean 150 (delta 50)
    // variant 1: pre mean 200, post mean 230 (delta 30) -> DiD = 20
    val rows = Seq(
      (0L, 1L, 100L), (0L, 2L, 100L), (0L, 8L, 150L), (0L, 9L, 150L),
      (1L, 1L, 200L), (1L, 2L, 200L), (1L, 8L, 230L), (1L, 9L, 230L))
      .toDF("g", "p", "x")
    val r = Experiment.diffInDiff(rows, col("g"), col("p"), col("x"))
      .head()
    assert(r.getLong(0) == 5L) // split = (1 + 9 + 1)/2
    assert(r.getLong(2) == 100L && r.getLong(4) == 150L &&
      r.getLong(6) == 200L && r.getLong(8) == 230L)
    assert(r.getLong(9) == 20L)
  }

  // --------------------------------------------------- centroid drift

  test("centroid drift: identical sides read cos 1e6 ratio 1000, flips read -1e6") {
    val same = Seq((1, 0L, Seq(1.0f, 2.0f)), (1, 1L, Seq(1.0f, 2.0f)),
      (2, 0L, Seq(1.0f, 0.0f)), (2, 1L, Seq(-1.0f, 0.0f)),
      (3, 0L, Seq(1.0f, 1.0f))).toDF("label", "g", "embedding")
    val out = EmbeddingDrift.centroidShift(same, "label", col("g"),
      "embedding").orderBy("label").collect()
    assert(out(0).getLong(3) == 1000000L && out(0).getLong(4) == 1000L)
    assert(out(1).getLong(3) == -1000000L)
    assert(out(2).getLong(3) == -2000000L && out(2).getLong(4) == -1L)
  }

  test("centroid drift: magnitude change reads in the norm ratio, not the cosine") {
    // side 1 = 3x side 0: same direction (cos 1), ratio 3000
    val df = Seq((1, 0L, Seq(1.0f, 2.0f)), (1, 1L, Seq(3.0f, 6.0f)))
      .toDF("label", "g", "embedding")
    val r = EmbeddingDrift.centroidShift(df, "label", col("g"),
      "embedding").head()
    assert(r.getLong(3) == 1000000L && r.getLong(4) == 3000L)
  }

  // ----------------------------------------------- IVF maintenance

  test("ivf maintenance: new batch routes onto base cells, drift sums to ~0") {
    // 8+ base vectors spread on two axes; new batch clusters near one
    val base = (0 until 12).map(i =>
      (i.toLong, Seq(if (i % 2 == 0) 10.0f else -10.0f, i.toFloat / 10), 0L))
    val fresh = (100 until 106).map(i =>
      (i.toLong, Seq(10.0f, 0.1f), 1L))
    val df = (base ++ fresh).toDF("id", "v", "nw")
    val out = IvfMaintenance.routingAudit(df, "id", "v",
      isNew = col("nw") === 1L, nCells = 4).collect()
    assert(out.map(_.getLong(1)).sum == 12L && out.map(_.getLong(2)).sum == 6L)
    // every new vector lands in a positive-axis cell: one cell holds 6
    assert(out.map(_.getLong(2)).max == 6L)
    // shares are milli-normalized: base shares sum to ~1000
    val baseShares = out.map(_.getLong(3)).sum
    assert(baseShares >= 990L && baseShares <= 1000L)
  }

  // ----------------------------------------------------- readability

  test("readability counts: sentences, vowel-group syllables, letters") {
    import graft.functions.TextFns
    val df = Seq("Simple words here. Easy to read! Yes?").toDF("text")
    val r = df.select(
      TextFns.sentenceCount(col("text")).as("s"),
      TextFns.syllableCount(TextFns.wordTokens(col("text"))).as("sy"),
      TextFns.letterCount(col("text")).as("l")).head()
    assert(r.getInt(0) == 3)
    // sim-ple(2) words(1) here(2: e...e -> 'e','e'? vowel runs: i, o, e+e
    // = simple: i,e = 2; words: o = 1; here: e,e = 2; easy: ea,y = 2;
    // to: 1; read: ea = 1; yes: e = 1  => 10
    assert(r.getLong(1) == 10L)
    assert(r.getInt(2) == "Simplewordshere".length +
      "Easytoread".length + "Yes".length)
  }

  test("readability: empty-ish text floors guard the formulas") {
    import graft.functions.TextFns
    val df = Seq("...").toDF("text")
    val r = df.select(TextFns.sentenceCount(col("text")).as("s"),
      TextFns.syllableCount(TextFns.wordTokens(col("text"))).as("sy"))
      .head()
    assert(r.getInt(0) == 1 && r.getLong(1) == 0L)
  }

  // --------------------------------------------------- sweep id guard

  test("sweep: a tie id beyond 1e12 fails loudly instead of mis-ordering") {
    val df = Seq((0L, 100L, 1000000000000L)).toDF("s", "e", "id")
    val ex = intercept[Exception] {
      Sweep.peakConcurrencyDaily(df, col("s"), col("e"), col("id"))
        .collect()
    }
    assert(ex.getMessage.contains("tie id out of") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("tie id out of"))
  }
}
