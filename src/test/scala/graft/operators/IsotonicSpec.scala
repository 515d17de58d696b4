package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form tests for the minimax-form isotonic (PAVA) fit. */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  /** rows = per-bin (binIndex, n, positives), rendered as probMilli
    * values landing mid-bin at bins = 10. Returns per-bin
    * (iso_micro, raw_inversion). */
  private def iso(rows: Seq[(Int, Int, Int)]): Map[Long, (Long, Long)] = {
    val flat = rows.flatMap { case (b, n, pos) =>
      (0 until n).map(i => (b * 100L + 50L, if (i < pos) 1L else 0L))
    }
    Calibration.isotonicBins(flat.toDF("p", "y"), col("p"), col("y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5)))
      .toMap
  }

  test("adjacent violator pools: [0.2, 0.1, 0.3] -> [0.15, 0.15, 0.3]") {
    val out = iso(Seq((0, 10, 2), (1, 10, 1), (2, 10, 3)))
    assert(out(0L) == ((150000L, 0L)))
    assert(out(1L) == ((150000L, 1L)), "the dip is pooled AND flagged")
    assert(out(2L) == ((300000L, 0L)))
  }

  test("already-monotone accuracies pass through untouched") {
    val out = iso(Seq((0, 10, 1), (1, 10, 2), (2, 10, 3)))
    assert(out.view.mapValues(_._1).toMap ==
      Map(0L -> 100000L, 1L -> 200000L, 2L -> 300000L))
    assert(out.values.forall(_._2 == 0L))
  }

  test("fully decreasing collapses to the global rate") {
    val out = iso(Seq((0, 10, 3), (1, 10, 2), (2, 10, 1)))
    assert(out.values.map(_._1).toSet == Set(200000L),
      s"all bins pool to 6/30: $out")
  }

  test("pooling weights by bin size, not bin count") {
    // n = [1, 3], acc = [1, 0]: pooled rate 1/4, not 1/2
    val out = iso(Seq((0, 1, 1), (1, 3, 0)))
    assert(out(0L)._1 == 250000L && out(1L)._1 == 250000L)
  }

  test("the fit is always non-decreasing across bins") {
    val out = iso(Seq((0, 7, 5), (1, 5, 1), (2, 9, 4), (3, 4, 4), (4, 6, 1)))
    val fit = out.toSeq.sortBy(_._1).map(_._2._1)
    assert(fit == fit.sorted, s"isotonic fit must be monotone: $fit")
  }
}
