package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the round-13 analytics operators: BFS hop
  * distance, interval coalescing, per-group OLS, and KMV set algebra. */
class AnalyticsOps13Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- BFS

  test("bfs: path graph distances from one seed, unreached absent") {
    // 1—2—3—4—5, seed 1, 3 rounds: node 5 stays unreached
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val out = Bfs.hopDistance(edges, Seq(1L).toDF("node"), rounds = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("bfs: multi-seed takes the minimum, distance is final at first reach") {
    // 1—2—3—4—5 with seeds {1, 5}: 3 is reached at 2 from both sides
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val out = Bfs.hopDistance(edges, Seq(1L, 5L).toDF("node"), rounds = 4)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 0L)))
  }

  test("bfs: a cycle converges and extra rounds are no-ops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val d2 = Bfs.hopDistance(edges, Seq(1L).toDF("node"), rounds = 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val d4 = Bfs.hopDistance(edges, Seq(1L).toDF("node"), rounds = 4)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(d2 == Seq((1L, 0L), (2L, 1L), (3L, 1L)) && d4 == d2)
  }

  // ---------------------------------------------- interval coalescing

  test("intervals: a long interval swallows short successors (lag(end) would split)") {
    // [0,100] covers [10,20] and [30,40]; [90,120] chains past its end;
    // [200,210] is a separate island. lag(end)-based logic would start
    // a new island at 30 (30 > 20) — running max end must not.
    val df = Seq((1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 30L, 40L),
      (1L, 4L, 90L, 120L), (1L, 5L, 200L, 210L))
      .toDF("k", "id", "s", "e")
    val out = Intervals.coalesce(df, "k", col("s"), col("e"), "id")
      .orderBy("island").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq((1L, 0L, 120L, 4L), (2L, 200L, 210L, 1L)))
  }

  test("intervals: touching intervals merge (start == running max end)") {
    val df = Seq((1L, 1L, 0L, 10L), (1L, 2L, 10L, 20L), (1L, 3L, 21L, 30L))
      .toDF("k", "id", "s", "e")
    val out = Intervals.coalesce(df, "k", col("s"), col("e"), "id")
      .orderBy("island").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq((1L, 0L, 20L, 2L), (2L, 21L, 30L, 1L)))
  }

  test("intervals: keys are independent") {
    val df = Seq((1L, 1L, 0L, 10L), (2L, 2L, 5L, 15L)).toDF("k", "id", "s", "e")
    assert(Intervals.coalesce(df, "k", col("s"), col("e"), "id").count() == 2L)
  }

  // ------------------------------------------------------------- OLS

  test("ols: a perfect line recovers slope, intercept and R^2 = 1") {
    val df = (1L to 10L).map(x => ("g", x, 2L * x + 3L)).toDF("g", "x", "y")
    val r = Regression.olsByGroup(df, Seq("g"), col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("ok") == 1L)
    assert(r.getAs[Long]("slope_micro") == 2000000L)
    assert(r.getAs[Long]("intercept_centi") == 300L)
    assert(r.getAs[Long]("r2_milli") == 1000L)
  }

  test("ols: degenerate x variance reports ok = 0 with zeroed estimates") {
    val df = Seq(("g", 5L, 1L), ("g", 5L, 9L)).toDF("g", "x", "y")
    val r = Regression.olsByGroup(df, Seq("g"), col("x"), col("y")).head()
    assert(r.getAs[Long]("ok") == 0L && r.getAs[Long]("slope_micro") == 0L &&
      r.getAs[Long]("r2_milli") == 0L)
  }

  test("ols: uncorrelated symmetric data reads slope 0") {
    val df = Seq(("g", -1L, 4L), ("g", 0L, 7L), ("g", 1L, 4L))
      .toDF("g", "x", "y")
    val r = Regression.olsByGroup(df, Seq("g"), col("x"), col("y")).head()
    assert(r.getAs[Long]("slope_micro") == 0L && r.getAs[Long]("r2_milli") == 0L)
  }

  // ------------------------------------------------------ robust stats

  test("mad: closed-form median/MAD and the 3-MAD gate") {
    // values 1..9 plus a far outlier 1000: med = 5 (lower median of 10),
    // deviations {0..4, 995} sorted {0,1,1,2,2,3,3,4,4,995} → MAD = 2
    // (rank ceil(5)=5), gate 3·2=6 flags only 1000
    val df = ((1L to 9L) :+ 1000L).map(("a", _)).toDF("k", "x")
    val r = RobustStats.madOutliers(df, "k", col("x")).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("med") == 5L)
    assert(r.getAs[Long]("mad") == 2L && r.getAs[Long]("n_out") == 1L)
  }

  test("mad: a majority-constant group reads MAD 0 and flags every deviant") {
    val df = (Seq.fill(6)(7L) ++ Seq(8L, 9L)).map(("a", _)).toDF("k", "x")
    val r = RobustStats.madOutliers(df, "k", col("x")).head()
    assert(r.getAs[Long]("med") == 7L && r.getAs[Long]("mad") == 0L &&
      r.getAs[Long]("n_out") == 2L)
  }

  test("weighted median: weights move the median off the unweighted one") {
    // values 1,2,3 with weights 1,1,10: W=12, ceil(W/2)=6 → wmed 3;
    // unweighted median would be 2
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 10L))
      .toDF("k", "v", "w")
    val r = RobustStats.weightedMedian(df, "k", col("v"), col("w")).head()
    assert(r.getAs[Long]("w_total") == 12L && r.getAs[Long]("wmed") == 3L)
    // duplicate values accumulate weight: 3×(1,w2) ties 1 vs (5,w6):
    // W=12, threshold 6 → cum(1)=6 reaches it
    val df2 = Seq(("a", 1L, 2L), ("a", 1L, 2L), ("a", 1L, 2L), ("a", 5L, 6L))
      .toDF("k", "v", "w")
    assert(RobustStats.weightedMedian(df2, "k", col("v"), col("w"))
      .head().getAs[Long]("wmed") == 1L)
  }

  // ------------------------------------------------------------ sweep

  test("sweep: nested and chained spans peak correctly") {
    // [0,100) ∪ [10,20) ∪ [15,30) overlap 3-deep at t=15; [200,250)
    // alone later the same day
    val df = Seq((1L, 0L, 100L), (2L, 10L, 20L), (3L, 15L, 30L),
      (4L, 200L, 250L)).toDF("id", "s", "e")
    val out = Sweep.peakConcurrencyDaily(df, col("s"), col("e"), col("id"))
      .head()
    assert(out.getAs[Long]("day_ms") == 0L &&
      out.getAs[Long]("n_boundaries") == 8L && out.getAs[Long]("peak") == 3L)
  }

  test("sweep: half-open boundaries — an end at t frees the slot for a start at t") {
    // back-to-back [0,10), [10,20), [20,30): never concurrent
    val df = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 20L, 30L))
      .toDF("id", "s", "e")
    assert(Sweep.peakConcurrencyDaily(df, col("s"), col("e"), col("id"))
      .head().getAs[Long]("peak") == 1L)
  }

  // -------------------------------------------------- clamped balance

  test("clamped balance: reflection identity equals the sequential recurrence") {
    // deterministic pseudo-random deltas per key, heavy on clamps
    val rows = for (k <- 1L to 4L; i <- 1L to 40L) yield {
      val d = ((k * 7919 + i * 104729) % 21) - 10 // −10..10
      (k, i, d)
    }
    val out = RunningOps.clampedBalance(rows.toDF("k", "id", "d"),
        "k", col("id"), "id", col("d"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_clamped"), r.getAs[Long]("final_balance"),
          r.getAs[Long]("peak_balance"))).toMap
    val ref = rows.groupBy(_._1).view.mapValues { evs =>
      var b = 0L; var clamps = 0L; var peak = 0L
      evs.sortBy(_._2).foreach { case (_, _, d) =>
        if (b + d < 0L) clamps += 1
        b = math.max(0L, b + d); peak = math.max(peak, b)
      }
      (clamps, b, peak)
    }.toMap
    assert(out == ref)
    assert(ref.values.exists(_._1 > 0L), "fixture must actually clamp")
  }

  test("clamped balance: equal-low revisits do not count as clamps") {
    // +5, −5 (lands exactly on 0 — not a clamp), −3 (the one clamp),
    // +2, −2 (lands exactly back on the low without undercutting it —
    // b + δ = 0, not a clamp)
    val df = Seq((1L, 1L, 5L), (1L, 2L, -5L), (1L, 3L, -3L), (1L, 4L, 2L),
      (1L, 5L, -2L)).toDF("k", "id", "d")
    val r = RunningOps.clampedBalance(df, "k", col("id"), "id", col("d")).head()
    assert(r.getAs[Long]("n_clamped") == 1L &&
      r.getAs[Long]("final_balance") == 0L &&
      r.getAs[Long]("peak_balance") == 5L)
  }

  // ------------------------------------- audit-query invariants (sf0.001)

  test("audit queries hold their statistical invariants on the fixture") {
    val d = sf("sf0.001")
    def run(name: String) = graft.Queries.all(name).fn(spark, d).collect()
    // q214 bootstrap: variance non-negative, B = 16 everywhere, and the
    // deterministic weights make reruns identical
    val boot = run("q214_bootstrap_var")
    assert(boot.forall(r => r.getAs[Long]("boot_var_c2") >= 0L &&
      r.getAs[Long]("b") == 16L))
    assert(run("q214_bootstrap_var").map(_.toString).toSeq ==
      boot.map(_.toString).toSeq, "bootstrap must be deterministic")
    // q215 survival: n_ge monotone non-increasing in lifetime, first
    // share = 1000 (everyone survives to the minimum observed lifetime
    // only when min lifetime is the smallest bucket — assert monotone +
    // bounds instead)
    val surv = run("q215_survival_curve")
    val nges = surv.map(_.getAs[Long]("n_ge"))
    assert(nges.zip(nges.tail).forall { case (a, b) => a >= b })
    assert(surv.forall(r => r.getAs[Long]("surv_milli") >= 0L &&
      r.getAs[Long]("surv_milli") <= 1000L))
    // q216 Benford: all nine digits, shares sum to ~1000 (floor slack)
    val ben = run("q216_benford_audit")
    assert(ben.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val obsSum = ben.map(_.getAs[Long]("obs_milli")).sum
    assert(obsSum >= 991L && obsSum <= 1000L, s"obs shares sum $obsSum")
    // q217 Gini in [0, 1000); a perfectly equal synthetic check is in
    // the formula: 2·Σr·x̄ = (n+1)·Σx when all x equal
    val gini = run("q217_gini").head.getAs[Long]("gini_milli")
    assert(gini >= 0L && gini < 1000L, s"gini $gini")
    // q218 Chao1: the estimate never falls below the observed richness
    val chao = run("q218_chao1")
    assert(chao.forall(r => r.getAs[Long]("chao1") >= r.getAs[Long]("s_obs")))
  }

  // ------------------------------------------------------- KMV set ops

  private def kvDf(rows: Seq[(String, Long)]) = rows.toDF("t", "id")

  test("kmv set ops: sub-k sketches are exact on every estimate") {
    val rows = (1L to 20L).map(("a", _)) ++ (11L to 30L).map(("b", _))
    val r = KmvSetOps.pairwiseDistinct(kvDf(rows), "t", "id", k = 64).head()
    assert(r.getAs[Long]("est_a") == 20L && r.getAs[Long]("est_b") == 20L)
    assert(r.getAs[Long]("est_union") == 30L && r.getAs[Long]("exact_union") == 30L)
    assert(r.getAs[Long]("est_inter") == 10L && r.getAs[Long]("exact_inter") == 10L)
    assert(r.getAs[Long]("err_union_milli") == 0L)
  }

  test("kmv set ops: disjoint sets estimate zero intersection") {
    val rows = (1L to 15L).map(("a", _)) ++ (100L to 114L).map(("b", _))
    val r = KmvSetOps.pairwiseDistinct(kvDf(rows), "t", "id", k = 64).head()
    assert(r.getAs[Long]("rho_num") == 0L && r.getAs[Long]("est_inter") == 0L &&
      r.getAs[Long]("exact_inter") == 0L)
  }

  test("kmv set ops: k-bounded sketches stay within the KMV error envelope") {
    // 600 vs 500 ids overlapping on 300: k=64 estimates carry ~1/sqrt(k)
    // (~12.5%) relative error; assert a generous 3-sigma band so the
    // test pins the estimator wiring, not the hash luck
    val rows = (1L to 600L).map(("a", _)) ++ (301L to 800L).map(("b", _))
    val r = KmvSetOps.pairwiseDistinct(kvDf(rows), "t", "id", k = 64).head()
    assert(r.getAs[Long]("exact_union") == 800L)
    val estU = r.getAs[Long]("est_union")
    assert(estU > 500L && estU < 1200L, s"est_union $estU out of envelope")
    val estI = r.getAs[Long]("est_inter")
    assert(estI > 100L && estI < 600L, s"est_inter $estI out of envelope")
    // duplicates never inflate: re-adding the same ids changes nothing
    val r2 = KmvSetOps.pairwiseDistinct(kvDf(rows ++ rows), "t", "id", 64).head()
    assert(r2.getAs[Long]("est_union") == estU &&
      r2.getAs[Long]("est_inter") == estI)
  }
}
