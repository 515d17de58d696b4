package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Built-in session_window semantics, pinned batch-side (the same
  * expression runs in both modes; the streaming execution path is
  * oracle-gated by x43): gap chaining, the exact-boundary rule, and
  * per-user isolation. */
class StreamSessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private val GapMs = 1000L // 1 s gap for readable fixtures
  private def ns(ms: Long) = ms * 1000000L

  private def run(rows: Seq[(Long, Long, Double)]) = // (user, ts_ms, value)
    StreamSessionWindow.sessions(
        rows.map { case (u, t, v) => (u, ns(t), v) }.toDF("user_id", "ts", "value"),
        s"$GapMs milliseconds")
      .orderBy(col("user_id"), col("sess_start_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("events within the gap chain into one session; end = last + gap") {
    val out = run(Seq((1L, 0L, 1.0), (1L, 900L, 1.0), (1L, 1800L, 1.0),
      (1L, 5000L, 1.0)))
    assert(out == Seq((1L, 0L, 2800L, 3L), (1L, 5000L, 6000L, 1L)))
  }

  test("an event at exactly last + gap still CHAINS (inclusive gap, <=)") {
    val out = run(Seq((1L, 0L, 1.0), (1L, 1000L, 1.0)))
    assert(out == Seq((1L, 0L, 2000L, 2L)),
      s"Spark chains on next - last <= gap; the oracle must spell > gap " +
        s"for its new-session flag: $out")
  }

  test("sessions never merge across users") {
    val out = run(Seq((1L, 0L, 1.0), (2L, 500L, 1.0)))
    assert(out == Seq((1L, 0L, 1000L, 1L), (2L, 500L, 1500L, 1L)))
  }

  test("sum is the floor-scaled micro total") {
    val out = StreamSessionWindow.sessions(
        Seq((1L, ns(0L), 1.25), (1L, ns(10L), 2.5)).toDF("user_id", "ts", "value"),
        s"$GapMs milliseconds")
      .select(col("sum_value_micro")).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(3750000L))
  }
}
