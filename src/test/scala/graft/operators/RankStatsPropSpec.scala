package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant tests for the round-14 eval/drift family over randomized
  * inputs (deterministic seeds) — the properties that must hold for
  * ANY data, complementing AnalyticsOps14Spec's closed forms. */
class RankStatsPropSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => ("g", i.toLong,
      rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .toDF("k", "id", "x", "y")
  }

  test("spearman: bounded and invariant under strictly monotone transforms") {
    val df = pairs(7, 120)
    val rho = RankStats.spearmanByGroup(df, "k", col("x"), col("y"))
      .head().getLong(2)
    assert(rho >= -1000000L && rho <= 1000000L)
    // x -> 3x + 17 preserves every rank, hence rho exactly
    val rho2 = RankStats.spearmanByGroup(
      df.withColumn("x", col("x") * 3L + 17L), "k", col("x"), col("y"))
      .head().getLong(2)
    assert(rho2 == rho)
  }

  test("mann-whitney: U identity and CLE bounds on random sides") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 300).map(i =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextInt(25).toLong))
      .toDF("s", "v")
    RankStats.mannWhitneyPairs(df, "s", col("v")).collect().foreach { r =>
      assert(r.getLong(4) + r.getLong(5) == 2L * r.getLong(2) * r.getLong(3),
        "u2_a + u2_b == 2 n_a n_b")
      assert(r.getLong(4) >= 0L && r.getLong(6) >= 0L &&
        r.getLong(6) <= 1000000L)
    }
  }

  test("auc: label flip complements to within one floor ulp") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 200).map(i =>
      ("g", rnd.nextInt(50).toLong, rnd.nextInt(2).toLong))
    val df = rows.toDF("k", "v", "y")
    val a = RankStats.aucByGroup(df, "k", col("v"), col("y"))
      .head().getLong(3)
    val b = RankStats.aucByGroup(df, "k", col("v"), lit(1L) - col("y"))
      .head().getLong(3)
    assert(math.abs(a + b - 1000000L) <= 1L)
  }

  test("kendall: |conc - disc| bounded by the pair count, tau in range") {
    val df = pairs(31, 60)
    val r = RankStats.kendallByGroup(df, "k", "id", col("x"), col("y"),
      cap = 1000L).head()
    val nUsed = r.getLong(1)
    assert(math.abs(r.getLong(2)) <= nUsed * (nUsed - 1) / 2)
    assert(r.getLong(3) >= -1000000L && r.getLong(3) <= 1000000L)
  }

  test("ks: D bounds, zero on identical sides, symmetric under side swap") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 200).map(i => ("a", rnd.nextInt(30).toLong)) ++
      (1 to 150).map(i => ("b", rnd.nextInt(30).toLong + 5L))
    val df = rows.toDF("s", "v")
    val r = DriftStats.ksPairs(df, "s", col("v")).head()
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000L)
    // swapping the side NAMES flips (side_a, side_b) but not D
    val sw = DriftStats.ksPairs(
      df.withColumn("s", when(col("s") === "a", "b").otherwise("a")),
      "s", col("v")).head()
    assert(sw.getLong(4) == r.getLong(4) && sw.getLong(5) == r.getLong(5))
  }

  test("psi: per-side scores are non-negative on any mix") {
    val rnd = new scala.util.Random(43)
    val df = (1 to 400).map(i =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextInt(8).toLong))
      .toDF("s", "b")
    DriftStats.psiBySide(df, "s", col("b")).collect()
      .foreach(r => assert(r.getLong(3) >= 0L,
        s"psi must be non-negative: $r"))
  }

  test("cusum: non-negative everywhere and zero on a constant series") {
    val rnd = new scala.util.Random(47)
    val df = (0 until 60).map(i =>
      ("g", i.toLong * 86400000L, rnd.nextInt(100).toLong + 1L))
      .toDF("k", "p", "x")
    TimeSeries.cusumDaily(df, "k", col("p"), col("x")).collect()
      .foreach(r => assert(r.getLong(3) >= 0L))
    val const = (0 until 20).map(i => ("g", i.toLong * 86400000L, 50L))
      .toDF("k", "p", "x")
    // constant series: every delta is -slack < 0, clamp pins at 0
    TimeSeries.cusumDaily(const, "k", col("p"), col("x")).collect()
      .foreach(r => assert(r.getLong(3) == 0L && r.getLong(4) == 0L))
  }

  test("rrf: a doc present in both runs outranks its single-run self") {
    val rnd = new scala.util.Random(53)
    val r1 = (1 to 20).map(i => (1L, s"d$i", i.toLong)).toDF("q", "d", "rank")
    val r2 = (1 to 20).map(i => (1L, s"d${21 - i}", i.toLong))
      .toDF("q", "d", "rank")
    val both = RetrievalEval.rrfFuse(Seq(r1, r2), "q", "d", "rank", k = 20)
      .collect()
    val one = RetrievalEval.rrfFuse(Seq(r1), "q", "d", "rank", k = 20)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    both.foreach { r =>
      if (r.getLong(4) == 2L)
        assert(r.getLong(3) > one(r.getString(2)),
          "two-run fusion must strictly exceed the one-run score")
    }
    val _ = rnd
  }

  test("ndcg: bounded by 1000 and monotone in relevant-hit promotion") {
    val run1 = Seq((1L, 1L, "x"), (1L, 2L, "r"), (1L, 3L, "y"))
      .toDF("q", "rank", "d")
    val run2 = Seq((1L, 1L, "r"), (1L, 2L, "x"), (1L, 3L, "y"))
      .toDF("q", "rank", "d")
    val truth = Seq((1L, "r")).toDF("q", "d")
    val n1 = RetrievalEval.ndcgAtK(run1, truth, "q", "d", "rank", 10)
      .head().getLong(4)
    val n2 = RetrievalEval.ndcgAtK(run2, truth, "q", "d", "rank", 10)
      .head().getLong(4)
    assert(n1 <= 1000L && n2 <= 1000L && n2 > n1,
      "promoting the relevant hit must raise nDCG")
  }

  test("trimmed means: trimmed and winsorized sit inside the fence band") {
    val rnd = new scala.util.Random(59)
    val df = (1 to 150).map(i => ("g", rnd.nextInt(2000).toLong - 500L))
      .toDF("k", "x")
    val r = RobustStats.trimmedMeans(df, "k", col("x")).head()
    val (lo, hi) = (r.getLong(2), r.getLong(3))
    assert(r.getLong(5) >= lo && r.getLong(5) <= hi, "trimmed in band")
    assert(r.getLong(6) >= lo && r.getLong(6) <= hi, "winsorized in band")
  }
}
