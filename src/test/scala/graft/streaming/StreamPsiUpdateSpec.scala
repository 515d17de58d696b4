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

  test("a staged novel-value day lands in the catch-all bucket and moves PSI") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("psiu_novel").toString
    val dayUs = 86400L * 1000000L
    val baseUs = 20000L * dayUs // day boundary, exact
    // 16 days × 100 rows: value 10.0 everywhere EXCEPT day 15, whose
    // value 99.0 the first-14-day reference never saw. Day 14 is the
    // in-support control (same shape as the reference); day 15 is the
    // final day, so the late rule (event_id % 50 = 0, days < final)
    // still finds rows to drop on earlier days.
    val rows = for { d <- 0 until 16; i <- 0 until 100 } yield
      (d * 100L + i, baseUs + d * dayUs + i * 1000000L, i.toLong,
        "t", if (d == 15) 99.0 else 10.0)
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(ts_us)")).drop("ts_us")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = StreamPsiUpdate.replayParquet(spark, dir, refDays = 14,
        queryName = "psiu_novel")
      .orderBy(col("day_ms")).collect()
    assert(out.length == 16)
    val control = out(14) // (day_ms, n_day, n_novel, psi_micro)
    val novelDay = out(15)
    assert(control.getLong(2) == 0L, s"control day has no novel mass: $control")
    assert(control.getLong(3) == 0L,
      s"control day matches the reference exactly, PSI = 0: $control")
    assert(novelDay.getLong(2) == novelDay.getLong(1),
      s"every surviving row of the novel day is outside the support: $novelDay")
    assert(novelDay.getLong(3) > 1000000L,
      s"PSI must move hard on an all-novel day: $novelDay")

    // the update-mode KS sibling on the SAME fixture (same shared
    // harness and state): the control day matches the reference
    // exactly (D = 0), the all-novel day is maximally separated
    // (D = 1, since every day value sits beyond the whole reference)
    val ks = StreamKsUpdate.replayParquet(spark, dir, refDays = 14,
        queryName = "ksu_novel")
      .orderBy(col("day_ms")).collect()
    assert(ks.length == 16)
    assert(ks(14).getLong(3) == 0L,
      s"control day: binned KS of identical distributions is 0: ${ks(14)}")
    assert(ks(15).getLong(3) == 1000L,
      s"novel day: D = 1 when supports are disjoint: ${ks(15)}")
    assert(ks(15).getLong(2) == ks(15).getLong(1) * 1400L,
      s"ks_num saturates at n_day*n_ref: ${ks(15)}")
  }
}
