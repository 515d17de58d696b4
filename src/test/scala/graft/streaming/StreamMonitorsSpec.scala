package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stream ≡ batch pins for the round-14 monitor+finisher streams: the
  * replay output must equal the batch twin row for row (the same
  * contract the shared oracles enforce at the driver gate, pinned here
  * against the batch OPERATOR directly). */
class StreamMonitorsSpec extends SparkSpec {

  test("x51 stream cusum replay equals the batch cusumDaily rows") {
    val d = sf("sf0.001")
    val streamed = StreamCusum.replayParquet(spark, d,
        queryName = "spec_x51")
      .orderBy(col("event_type"), col("period_ms")).collect().toSeq
    val batch = graft.operators.TimeSeries.cusumDaily(
        graft.sources.Tables.table(spark, d, "events"), "event_type",
        periodMs = expr("(ts DIV 1000000 DIV 86400000) * 86400000"),
        value = expr("CAST(FLOOR(value * 100) AS BIGINT)"))
      .orderBy(col("event_type"), col("period_ms")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("x53 stream bot screen replay equals the batch botScore rows") {
    val d = sf("sf0.001")
    val streamed = StreamBotScore.replayParquet(spark, d,
        queryName = "spec_x53")
      .orderBy(col("user_id")).collect().toSeq
    val batch = graft.operators.Behavior.botScore(
        graft.sources.Tables.table(spark, d, "events"),
        "user_id", col("ts"), "event_type")
      .orderBy(col("user_id")).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("x54 stream PSI replay: non-negative per day, shared state shape") {
    val d = sf("sf0.001")
    val out = StreamPsiDrift.replayParquet(spark, d, queryName = "spec_x54")
      .orderBy(col("day_ms")).collect()
    assert(out.nonEmpty)
    // per-bucket PSI terms are (p-q)ln(p/q) >= 0, so the day sums are
    out.foreach(r => assert(r.getLong(3) >= 0L, s"psi >= 0: $r"))
    // self-referential reference: the catch-all is structurally empty
    out.foreach(r => assert(r.getLong(2) == 0L, s"n_novel == 0: $r"))
  }

  test("x52 stream KS replay: per-day stats are internally consistent") {
    val d = sf("sf0.001")
    val out = StreamKsDrift.replayParquet(spark, d, queryName = "spec_x52")
      .orderBy(col("day_ms")).collect()
    assert(out.nonEmpty)
    // D is a normalized sup-gap: 0 ≤ ks_milli ≤ 1000, and the integer
    // numerator can never exceed n_day · n_all
    val nAll = out.map(_.getLong(1)).sum
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) * nAll)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000L)
    }
  }
}
