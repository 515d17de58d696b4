package graft.cluster

import org.scalatest.funsuite.AnyFunSuite

/** Affinity propagation on the reference's exact clustering fixture
  * (`tests/test_clustering.py:17-23`: rows of 1s, −1s, 0.5s — rows 0
  * and 2 are cosine-identical, row 1 is opposite) plus structural
  * invariants of the exemplar refinement. */
class AffinityPropagationSpec extends AnyFunSuite {

  private val fixture: Array[Array[Double]] = Array(
    Array.fill(5)(1.0), Array.fill(5)(-1.0), Array.fill(5)(0.5))

  test("reference 3x5 fixture: identical directions cluster, opposite splits") {
    // exact similarity matrix: -(1 - cos) → s(0,2) = 0, s(0,1) = -2
    val s = AffinityPropagation.negCosineDistances(fixture)
    assert(math.abs(s(0)(2) - 0.0) <= 1e-12)
    assert(math.abs(s(0)(1) - -2.0) <= 1e-12)
    assert(math.abs(s(1)(2) - -2.0) <= 1e-12)

    // explicit preference: the median default is 0 here, which sits
    // exactly at s(0,2) — an intentionally ambiguous boundary; −1 makes
    // exemplar-hood cost more than merging identical directions
    val res = AffinityPropagation.fitPredictPoints(fixture,
      AffinityPropagation.Config(preference = Some(-1.0)))
    assert(res.converged, s"must converge (ran ${res.iterations} iters)")
    assert(res.labels(0) == res.labels(2), "cosine-identical rows share a cluster")
    assert(res.labels(0) != res.labels(1), "opposite row gets its own cluster")
    assert(res.exemplars.length == 2)
    // labels are exemplar indices renumbered 0..K-1; exemplars label themselves
    res.exemplars.zipWithIndex.foreach { case (e, c) => assert(res.labels(e) == c) }
  }

  test("three tight direction groups → three clusters, deterministic") {
    def pt(dir: Int, eps: Double) =
      Array.tabulate(4)(j => (if (j == dir) 1.0 else 0.0) + (if (j == 3) eps else 0.0))
    val pts = Array(
      pt(0, 0.00), pt(0, 0.01), pt(0, 0.02),
      pt(1, 0.00), pt(1, 0.01), pt(1, 0.02),
      pt(2, 0.00), pt(2, 0.01), pt(2, 0.02))
    val r1 = AffinityPropagation.fitPredictPoints(pts)
    val r2 = AffinityPropagation.fitPredictPoints(pts)
    assert(r1.labels.toSeq == r2.labels.toSeq, "no RNG → bit-identical reruns")
    assert(r1.labels.distinct.length == 3)
    assert(r1.labels.slice(0, 3).distinct.length == 1)
    assert(r1.labels.slice(3, 6).distinct.length == 1)
    assert(r1.labels.slice(6, 9).distinct.length == 1)
  }

  test("explicit preference controls cluster granularity") {
    val pts = Array(
      Array(1.0, 0.0), Array(0.98, 0.2), Array(0.0, 1.0), Array(0.2, 0.98))
    // very negative preference → exemplars are expensive → fewer clusters
    val coarse = AffinityPropagation.fitPredictPoints(pts,
      AffinityPropagation.Config(preference = Some(-5.0)))
    // preference at the self-similarity ceiling → every point an exemplar
    val fine = AffinityPropagation.fitPredictPoints(pts,
      AffinityPropagation.Config(preference = Some(0.0)))
    assert(coarse.labels.distinct.length <= fine.labels.distinct.length)
    assert(fine.labels.distinct.length == 4)
  }

  test("input validation") {
    intercept[IllegalArgumentException](
      AffinityPropagation.fitPredict(Array(Array(0.0))))
    intercept[IllegalArgumentException](
      AffinityPropagation.Config(damping = 1.0))
  }
}
