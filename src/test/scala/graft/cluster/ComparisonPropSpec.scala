package graft.cluster

import graft.cluster.Comparison._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the comparison math (SURVEY.md §5: closed-form
  * invariants — non-negativity, symmetry, perfect-match scores). */
object ComparisonPropSpec extends Properties("Comparison") {

  private val assignments: Gen[Seq[(Int, Int)]] = for {
    n <- Gen.choose(2, 40)
    ka <- Gen.choose(1, 5); kb <- Gen.choose(1, 5)
    a <- Gen.listOfN(n, Gen.choose(0, ka - 1))
    b <- Gen.listOfN(n, Gen.choose(0, kb - 1))
  } yield a.zip(b)

  private def table(pairs: Seq[(Int, Int)]) =
    fromTriples(pairs.groupBy(identity).map { case ((a, b), g) =>
      (a, b, g.size.toDouble) }.toSeq)

  property("MI is non-negative") = forAll(assignments) { pairs =>
    mutualInformation(table(pairs)) >= -1e-12
  }

  property("uniform VOI is non-negative") = forAll(assignments) { pairs =>
    uniformVoi(pairs) >= -1e-12
  }

  property("VOI of a partition with itself is 0") = forAll(assignments) { pairs =>
    val self = pairs.map { case (a, _) => (a, a) }
    math.abs(uniformVoi(self)) < 1e-9
  }

  property("VOI is symmetric") = forAll(assignments) { pairs =>
    math.abs(uniformVoi(pairs) - uniformVoi(pairs.map(_.swap))) < 1e-9
  }

  property("ARI/RI/NMI of identical partitions are 1") = forAll(assignments) { pairs =>
    val self = table(pairs.map { case (a, _) => (a, a) })
    math.abs(adjustedRandIndex(self) - 1) < 1e-9 &&
      math.abs(randIndex(self) - 1) < 1e-9 &&
      math.abs(normalizedMutualInformation(self) - 1) < 1e-9
  }

  property("ARI ≤ 1; RI ∈ [0,1]; NMI ∈ [0,1]") = forAll(assignments) { pairs =>
    val t = table(pairs)
    adjustedRandIndex(t) <= 1 + 1e-9 &&
      randIndex(t) >= -1e-9 && randIndex(t) <= 1 + 1e-9 &&
      normalizedMutualInformation(t) >= -1e-9 &&
      normalizedMutualInformation(t) <= 1 + 1e-9
  }

  property("max-matching pairs are unique per row and column") =
    forAll(assignments) { pairs =>
      val (m, _, _) = maximumMatching(table(pairs))
      m.map(_._1).distinct.size == m.size && m.map(_._2).distinct.size == m.size
    }

  property("entropy of a point mass is 0; uniform is log2 k") =
    forAll(Gen.choose(1, 20)) { k =>
      math.abs(entropy(Array.fill(k)(1.0 / k)) -
        math.log(k.toDouble) / math.log(2.0)) < 1e-9 &&
        entropy(Array(1.0)) == 0.0
    }
}
