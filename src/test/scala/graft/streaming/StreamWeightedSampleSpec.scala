package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StreamWeightedSample A-ES math on batch frames (the windowed agg is
  * semantics-identical batch-side; the streaming execution path is
  * oracle-gated by x40). Properties: a window the sample fully covers
  * selects everything; an oversubscribed window selects exactly k, the
  * k LARGEST tickets, deterministically; and weight-4 items are
  * selected far more often than weight-1 items (the A-ES
  * proportionality the max-of-w-uniforms identity promises). */
class StreamWeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private val DayNs = 86400L * 1000 * 1000 * 1000

  private def eventsDf(rows: Seq[(Long, Long)]) = // (event_id, ts)
    rows.toDF("event_id", "ts")

  private def run(rows: Seq[(Long, Long)]) = {
    graft.functions.NativeFns.register(spark)
    StreamWeightedSample.audit(
        StreamWeightedSample.dailySamples(eventsDf(rows)))
      .orderBy(col("bucket_ms"), col("ticket").desc, col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("n <= k: every event is selected, weights 1..4 as id mod 4 + 1") {
    val rows = (0L until 20L).map(i => (i, i * 1000000L))
    val got = run(rows)
    assert(got.size == 20)
    assert(got.map(_._2).sorted == (0L until 20L))
    assert(got.forall { case (_, id, wt) => wt == 1 + id % 4 })
  }

  test("n > k: exactly k kept per window, the k largest tickets, deterministic") {
    val rows = (0 until 500).map { i =>
      val day = if (i < 300) 0L else 1L
      (i.toLong, day * DayNs + i * 1000000L)
    }
    val a = run(rows)
    assert(a == run(rows), "md5-ticket selection must be deterministic")
    val byWin = a.groupBy(_._1)
    assert(byWin.size == 2 && byWin.values.forall(_.size == 32))
    // per window, the kept set must be exactly the top-32 by ticket
    // recomputed independently over ALL the window's events
    val tickets = eventsDf(rows)
      .withColumn("bucket_ms",
        (col("ts") / lit(DayNs)).cast("long") * lit(86400000L))
      .withColumn("wt", StreamWeightedSample.weight(col("event_id")))
      .withColumn("ticket",
        StreamWeightedSample.ticket(col("event_id"), col("wt")))
      .select(col("bucket_ms"), col("event_id"), col("ticket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    tickets.groupBy(_._1).foreach { case (w, all) =>
      val want = all.sortBy(t => (-t._3, t._2)).take(32).map(_._2).toSet
      val got = byWin(w).map(_._2).toSet
      assert(got == want, s"window $w must keep exactly the top-32 tickets")
    }
    // proportionality: weight-4 events selected well above weight-1
    val wHist = a.groupBy(_._3).view.mapValues(_.size).toMap
    assert(wHist.getOrElse(4L, 0) > wHist.getOrElse(1L, 0),
      s"weight-4 must dominate weight-1 in the selected set: $wHist")
  }
}
