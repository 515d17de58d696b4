package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rolling-distinct semantics, pinned batch-side (the same dedup →
  * windowed-count expression runs in both modes; the chained-stateful
  * streaming execution path is oracle-gated by x44): per-day dedup,
  * exact 7-day visibility, and cross-user counting. */
class StreamRollingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val DayNs = 86400L * 1000000000L

  private def run(rows: Seq[(Long, Long)]) = // (user, day index)
    StreamRollingDistinct.dailyDistinct(
        rows.map { case (u, d) => (u, d * DayNs + 1L) }.toDF("user_id", "ts"),
        windowDays = 7)
      .orderBy(col("day_ms"))
      .collect()
      .map(r => (r.getLong(0) / 86400000L, r.getLong(1)))
      .toSeq

  test("many events by one user on one day count once") {
    val out = run(Seq((1L, 0L), (1L, 0L), (1L, 0L)))
    assert(out == (0L to 6L).map(d => (d, 1L)))
  }

  test("visibility spans exactly the 7 window days") {
    val out = run(Seq((1L, 0L)))
    assert(out.map(_._1) == (0L to 6L) && out.forall(_._2 == 1L),
      s"a day-0 event is visible on days 0..6 and nowhere else: $out")
  }

  test("distinct users accumulate across overlapping visibility") {
    val out = run(Seq((1L, 0L), (2L, 3L))).toMap
    assert(out(0L) == 1L && out(3L) == 2L && out(6L) == 2L && out(9L) == 1L,
      s"user 2 joins the window on day 3 and survives to day 9: $out")
  }

  test("re-activity inside the window does not double-count") {
    // user 1 active on days 0 AND 2: days 2..6 see them once
    val out = run(Seq((1L, 0L), (1L, 2L))).toMap
    assert(out(2L) == 1L && out(6L) == 1L && out(8L) == 1L,
      s"the (user, target-day) dedup absorbs re-activity: $out")
  }
}
