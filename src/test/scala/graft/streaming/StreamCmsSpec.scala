package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StreamCms counter/estimator math on batch frames (the windowed agg
  * is semantics-identical batch-side; the streaming execution path is
  * oracle-gated by x38). Properties: CMS never under-estimates, and
  * with a single key there are no collisions so the estimate is
  * exact. */
class StreamCmsSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, Long)]) = // (ts nanos, user_id)
    rows.toDF("ts", "user_id")

  private val HourNs = 3600L * 1000 * 1000 * 1000

  test("single key: estimate equals the true per-hour count (no collisions possible)") {
    val rows = (0 until 30).map(k => ((k / 10) * HourNs + k * 1000000L, 7L))
    val counters = StreamCms.hourlyCounters(eventsDf(rows))
    val est = StreamCms.estimates(counters, Seq(7L).toDF("user_id"))
      .orderBy(col("bucket_ms")).collect()
    assert(est.length == 3)
    assert(est.forall(_.getLong(2) == 10L),
      s"each of the 3 hours holds exactly 10 events: ${est.mkString(",")}")
  }

  test("many keys: estimate is never below the true count, for every probe and hour") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { _ =>
      (rnd.nextInt(4).toLong * HourNs + rnd.nextInt(1000000), rnd.nextInt(40).toLong)
    }
    val ev = eventsDf(rows)
    val counters = StreamCms.hourlyCounters(ev)
    val probes = (0L until 40L).toDF("user_id")
    val est = StreamCms.estimates(counters, probes)
    val exact = ev
      .groupBy((floor(col("ts") / lit(HourNs)) * 3600000L).as("bucket_ms"),
        col("user_id"))
      .agg(count(lit(1)).as("true_cnt"))
    val joined = est.join(exact, Seq("bucket_ms", "user_id"), "left")
      .select(col("est_cnt"), coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(0) >= r.getLong(1),
        s"CMS must never under-estimate: est ${r.getLong(0)} < true ${r.getLong(1)}")
    }
    // and with w=16 over 40 keys, collisions MUST over-estimate somewhere
    assert(joined.exists(r => r.getLong(0) > r.getLong(1)),
      "the deliberately tiny width should produce at least one over-estimate")
  }
}
