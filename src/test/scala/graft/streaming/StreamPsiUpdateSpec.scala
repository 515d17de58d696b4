package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The late-data witness, pinned end-to-end: x55's append-mode replay
  * must emit per-day counts equal to the batch counts MINUS exactly
  * the staged-late rows (`event_id % 50 = 0`, days before the final
  * day) — proving the watermark cutoff dropped them and nothing else. */
class StreamPsiUpdateSpec extends SparkSpec {

  test("watermark drops exactly the staged-late rows, nothing else") {
    val dir = sf("sf0.001")
    val DayNs = 86400L * 1000000000L
    val norm = graft.sources.Tables.table(spark, dir, "events")
    val finalDay = norm.agg(max(col("ts"))).head().getLong(0) / DayNs
    val perDay = norm
      .groupBy(expr(s"ts DIV $DayNs").as("day"))
      .agg(count(lit(1)).cast("long").as("full"),
        sum(when(col("event_id") % 50 === 0
          && expr(s"ts DIV $DayNs") < finalDay, 1L).otherwise(0L))
          .cast("long").as("late"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val out = StreamPsiUpdate.replayParquet(spark, dir,
        queryName = "psiu_spec")
      .collect().map(r => r.getLong(0) / 86400000L -> r.getLong(1)).toMap

    assert(out.keySet == perDay.keySet, "every day must close and emit")
    perDay.foreach { case (day, (full, late)) =>
      assert(out(day) == full - late,
        s"day $day: expected ${full - late} surviving rows, got ${out(day)}")
    }
    assert(perDay.values.map(_._2).sum > 0,
      "the fixture must actually contain late rows for the witness to bite")
  }
}
