package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the Theil–Sen robust trend estimator. */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  private def ts(rows: Seq[(String, Long, Long, Long)], cap: Long = 200L) =
    Regression.theilSenByGroup(
        rows.toDF("g", "id", "x", "y"), "g", "id",
        col("x"), col("y"), cap)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("perfect line recovers slope and intercept exactly") {
    // y = 2x + 3 on x = 0..4
    val rows = (0L to 4L).map(x => ("a", x, x, 2 * x + 3))
    val out = ts(rows)("a")
    assert(out == ((5L, 10L, 2000000L, 3000000L)))
  }

  test("one wild outlier does not move the median slope (OLS would)") {
    // y = x on x = 0..8, plus (9, 1000): 36 clean pairs out of 45
    val rows = (0L to 8L).map(x => ("a", x, x, x)) :+ (("a", 9L, 9L, 1000L))
    val (_, nPairs, slope, intercept) = ts(rows)("a")
    assert(nPairs == 45L)
    assert(slope == 1000000L, "robust slope must stay at 1")
    assert(intercept == 0L, "median residual ignores the outlier")
  }

  test("negative and fractional slopes: sign-factored DIV is exact") {
    // y = -3x: slope -3 exactly
    val neg = ts((0L to 3L).map(x => ("a", x, x, -3 * x)))("a")
    assert(neg._3 == -3000000L)
    // slopes {0, 1/2, 1}: lower median 1/2 -> 500000 exactly
    val frac = ts(Seq(("b", 0L, 0L, 0L), ("b", 1L, 1L, 0L),
      ("b", 2L, 2L, 1L)))("b")
    assert(frac._2 == 3L && frac._3 == 500000L)
  }

  test("vertical pairs (equal x) are skipped, not divided by zero") {
    val out = ts(Seq(("a", 1L, 0L, 0L), ("a", 2L, 0L, 5L),
      ("a", 3L, 1L, 2L)))("a")
    // only the two cross-x pairs survive: slopes {2, -3}; lower median -3
    assert(out._2 == 2L && out._3 == -3000000L)
  }

  test("the hash cap bounds the pair join and stays deterministic") {
    val rows = (0L until 100L).map(x => ("a", x, x, x))
    val a = ts(rows, cap = 10L)("a")
    val b = ts(rows, cap = 10L)("a")
    assert(a == b, "md5 gate must be deterministic")
    assert(a._1 < 30L, s"cap=10 must trim the 100-member group: ${a._1}")
    assert(a._3 == 1000000L, "the subsample still estimates slope 1")
  }
}
