package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the Hodges–Lehmann pseudo-median. */
class HodgesLehmannSpec extends SparkSpec {
  import spark.implicits._

  private def hl(xs: Seq[Long], cap: Long = 200L): (Long, Long, Long, Long) = {
    val rows = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
    val r = RobustStats.hodgesLehmann(rows.toDF("g", "id", "x"),
      "g", "id", col("x"), cap).head()
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("walsh lattice of {0, 10}: sums {0, 10, 20}, pseudo-median 5") {
    // singletons ARE included (i <= j): the lattice has n(n+1)/2 points
    val (n, np, pm, med) = hl(Seq(0L, 10L))
    assert(n == 2L && np == 3L)
    assert(pm == 10L, "median walsh SUM = 10 -> pseudo-median 5 units")
    assert(med == 0L, "lower median of {0, 10}")
  }

  test("symmetric data: pseudo-median sits at the center") {
    val (_, np, pm, _) = hl(Seq(1L, 2L, 3L, 4L, 5L))
    assert(np == 15L && pm == 6L, "center 3 -> walsh sum 6")
  }

  test("one wild outlier barely moves it (the mean would follow)") {
    val (_, _, pm, med) = hl(Seq(1L, 2L, 3L, 4L, 1000L))
    assert(pm == 6L, s"pseudo-median stays at 3 (walsh sum 6): $pm")
    assert(med == 3L)
  }

  test("negative values are first-class (balance-like data)") {
    val (_, _, pm, med) = hl(Seq(-10L, -2L, 4L))
    // walsh sums: -20, -12, -6, -4, 2, 8 -> lower median -6
    assert(pm == -6L && med == -2L)
  }

  test("the hash cap bounds the lattice and stays deterministic") {
    val xs = (0L until 100L).map(x => x)
    val a = hl(xs, cap = 10L); val b = hl(xs, cap = 10L)
    assert(a == b)
    assert(a._1 < 30L, s"cap=10 must trim the 100-member group: ${a._1}")
  }
}
