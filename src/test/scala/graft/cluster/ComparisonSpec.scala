package graft.cluster

import graft.SparkSpec
import graft.cluster.Comparison._

/** Exact-math tests ported from the reference's
  * `tests/test_clustering.py:317-437` (FIXTURES.md §8): closed-form
  * contingency / MI / VOI / max-match expectations, plus invariants. */
class ComparisonSpec extends SparkSpec {
  import spark.implicits._

  private val log2_3 = math.log(3.0) / math.log(2.0)
  private def log2d(x: Double) = math.log(x) / math.log(2.0)

  // FIXTURES §8: assignments [-1,1,2] vs [1,2,-1], weights c1+c2 when
  // both > 0: counts [10,5,10] and [8,8,8] → weighted contingency
  // [[0,18,0],[0,0,13],[18,0,0]]
  private val weighted = fromTriples(Seq(
    (-1, 1, 18.0), (1, 2, 13.0), (2, -1, 18.0)))

  test("X11 weighted contingency matches the reference fixture") {
    assert(weighted.rows == Seq(-1, 1, 2) && weighted.cols == Seq(-1, 1, 2))
    assert(weighted.m.map(_.toSeq).toSeq == Seq(
      Seq(0.0, 18.0, 0.0), Seq(0.0, 0.0, 13.0), Seq(18.0, 0.0, 0.0)))
  }

  test("X12 MI of a permutation-structured table is the entropy") {
    // every row maps to exactly one column → MI == H(rows)
    val n = weighted.total
    val expected = entropy(weighted.rowSums.map(_ / n))
    assert(math.abs(mutualInformation(weighted) - expected) < 1e-12)
    // uniform permutation: MI = log2(3) exactly
    val uniform = fromTriples(Seq((0, 1, 5.0), (1, 2, 5.0), (2, 0, 5.0)))
    assert(math.abs(mutualInformation(uniform) - log2_3) < 1e-12)
  }

  test("X13 VOI uniform: reference closed form (test_clustering.py:366-373)") {
    // clusterings [-1,1,2] vs [1,2,-1], uniform counts:
    // VOI = −2·log2(1/3) − 2·log2(3) = 0
    val voi = uniformVoi(Seq((-1, 1), (1, 2), (2, -1)))
    assert(math.abs(voi - (-2 * log2d(1.0 / 3) - 2 * log2d(3.0))) < 1e-12)
  }

  test("X13 VOI weighted: reference closed form (test_clustering.py:376-399)") {
    val data = Seq(
      Assignment(-1, 1, 10, 8), Assignment(1, 2, 5, 8), Assignment(2, -1, 10, 8))
    val expectedMi = 2 * ((18.0 / 49) * log2d(9.0 * 15 / 49)) +
      (13.0 / 49) * log2d(13.0 * 15 / 49)
    val mi = referenceMutualInformation(
      fromTriples(Seq((-1, 1, 18.0), (1, 2, 13.0), (2, -1, 18.0))),
      Array(2.0 / 5, 1.0 / 5, 2.0 / 5), Array(1.0 / 3, 1.0 / 3, 1.0 / 3))
    assert(math.abs(mi - expectedMi) < 1e-12)
    val expectedVoi =
      -((4.0 / 5) * log2d(2.0 / 5) + (1.0 / 5) * log2d(1.0 / 5)) -
        log2d(1.0 / 3) - 2 * expectedMi
    assert(math.abs(variationOfInformation(data) - expectedVoi) < 1e-12)
  }

  test("X13 VOI distributed adapter matches driver form") {
    val df = Seq((-1, 1, 10.0, 8.0), (1, 2, 5.0, 8.0), (2, -1, 10.0, 8.0))
      .toDF("c1", "c2", "n1", "n2")
    val driver = variationOfInformation(Seq(
      Assignment(-1, 1, 10, 8), Assignment(1, 2, 5, 8), Assignment(2, -1, 10, 8)))
    assert(math.abs(variationOfInformation(df, "c1", "c2", "n1", "n2") - driver) < 1e-12)
  }

  test("X15 greedy maximum matching: reference order and unpaired fill") {
    // reference fixture (test_clustering.py:432-437):
    // [[0,1,2,0],[4,2,0,0],[1,1,1,0]] → pairs ([1,0,2,None],[0,2,1,3])
    val c = Contingency(Seq(0, 1, 2), Seq(0, 1, 2, 3), Array(
      Array(0.0, 1.0, 2.0, 0.0), Array(4.0, 2.0, 0.0, 0.0),
      Array(1.0, 1.0, 1.0, 0.0)))
    val (pairs, unpairedRows, unpairedCols) = maximumMatching(c)
    assert(pairs == Seq((1, 0), (0, 2), (2, 1)))
    assert(unpairedRows.isEmpty && unpairedCols == Seq(3))
  }

  test("X14 ARI/RI/NMI/h/c/v: identical partitions score perfectly") {
    val ident = fromTriples(Seq((0, 0, 10.0), (1, 1, 20.0), (2, 2, 5.0)))
    assert(math.abs(adjustedRandIndex(ident) - 1.0) < 1e-12)
    assert(math.abs(randIndex(ident) - 1.0) < 1e-12)
    assert(math.abs(normalizedMutualInformation(ident) - 1.0) < 1e-12)
    val (h, cm, v) = homogeneityCompletenessV(ident)
    assert(math.abs(h - 1) < 1e-12 && math.abs(cm - 1) < 1e-12 && math.abs(v - 1) < 1e-12)
  }

  test("X14 ARI of independent partitions ≈ 0, MI exactly 0") {
    val indep = fromTriples(Seq((0, 0, 25.0), (0, 1, 25.0), (1, 0, 25.0), (1, 1, 25.0)))
    assert(math.abs(adjustedRandIndex(indep)) < 0.05)
    assert(math.abs(mutualInformation(indep)) < 1e-12)
  }

  test("X19 probabilities with missing-key default (test_clustering.py:317-327)") {
    val counts = Map("aww" -> 75.0, "AskReddit" -> 100.0,
      "someOtherSubreddit" -> 25.0, "conservatives" -> 25.0)
    val p = getProbabilities(counts,
      Seq("aww", "AskReddit", "someOtherSubreddit", "lepoardsatemyface"))
    assert(p.toSeq == Seq(0.375, 0.5, 0.125, 0.0))
    // cluster probabilities (test_clustering.py:329-337)
    val cp = clusterProbabilities(Seq(1, 2, 1, 2), Seq(12.0, 50.0, 13.0, 25.0), Seq(1, 2))
    assert(cp.toSeq == Seq(0.25, 0.75))
  }

  test("SO1 remap: union fills −1, intersection drops") {
    val a = Seq(("x", 0), ("y", 1)).toDF("k", "cluster")
    val b = Seq(("y", 5), ("z", 6)).toDF("k", "cluster")
    val union = remapClusters(a, b, "k", "cluster", useUnion = true)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(union == Map("x" -> ((0, -1)), "y" -> ((1, 5)), "z" -> ((-1, 6))))
    val inter = remapClusters(a, b, "k", "cluster", useUnion = false)
    assert(inter.collect().map(_.getString(0)).toSeq == Seq("y"))
  }

  test("X11 contingency from a DataFrame aggregation") {
    val df = Seq((0, 0), (0, 0), (0, 1), (1, 1)).toDF("a", "b")
    val c = contingency(df, "a", "b")
    assert(c.m.map(_.toSeq).toSeq == Seq(Seq(2.0, 1.0), Seq(0.0, 1.0)))
  }
}
