package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StreamQuantile sample/estimator math on batch frames (the windowed
  * agg is semantics-identical batch-side; the streaming execution path
  * is oracle-gated by x39). Properties: a window the sample fully
  * covers estimates exactly; a subsampled window estimates
  * deterministically, within the value range, and monotone in pct. */
class StreamQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val DayNs = 86400L * 1000 * 1000 * 1000

  private def eventsDf(rows: Seq[(Long, Long, Double)]) = // (event_id, ts, value)
    rows.toDF("event_id", "ts", "value")

  test("n <= k: the sample is the window, so every percentile is exact") {
    graft.functions.NativeFns.register(spark)
    val rows = (1 to 100).map(i => (i.toLong, i * 1000000L, i.toDouble))
    val est = StreamQuantile.estimates(
        StreamQuantile.dailySamples(eventsDf(rows)))
      .orderBy(col("pct")).collect()
    assert(est.map(r => r.getLong(1) -> r.getLong(2)).toSeq ==
      Seq(50L -> 5000L, 90L -> 9000L, 99L -> 9900L))
  }

  test("n > k: deterministic, bounded by the value range, monotone in pct") {
    graft.functions.NativeFns.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 1500).map { i =>
      val day = if (i < 1000) 0L else 1L
      (i.toLong, day * DayNs + i * 1000000L, rnd.nextInt(40000) / 100.0)
    }
    val ev = eventsDf(rows)
    def run() = StreamQuantile.estimates(StreamQuantile.dailySamples(ev))
      .orderBy(col("bucket_ms"), col("pct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run()
    assert(a == run(), "md5-keyed sampling must be deterministic")
    assert(a.map(_._1).distinct.size == 2, "both day windows present")
    a.groupBy(_._1).foreach { case (_, g) =>
      val byPct = g.sortBy(_._2).map(_._3)
      assert(byPct == byPct.sorted, s"est_v must be monotone in pct: $g")
      assert(byPct.forall(v => v >= 0 && v < 40000))
    }
  }
}
