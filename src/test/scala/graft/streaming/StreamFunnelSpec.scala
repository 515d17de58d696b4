package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the stateful funnel: the replay over a staged
  * parquet must reproduce Funnel.existsChain exactly — per-step counts,
  * depth, horizon cutoffs, equal-ts dedup, and first-conversion stamp. */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // 1h in ns
  // B: base offset — events AT event-time 0 ms are dropped against the
  // INITIAL watermark (<= 0) by the stateful operator, a degenerate
  // epoch-0 artifact real data never hits
  private val B = 1000000000000000000L // ~2001-09 in ns
  // (user, event_id, ts-ns, type): full chains, horizon misses, dup ts,
  // a click-before-view, and a user with no step-1 at all
  private val rows = Seq(
    (1L, 1L, B, "view"), (1L, 2L, B + H / 2, "click"), (1L, 3L, B + H, "purchase"),
    (2L, 4L, B, "view"), (2L, 5L, B + 3 * H, "click"), // 3h > the 2h horizon
    (3L, 6L, B, "click"), (3L, 7L, B + H, "view"), (3L, 8L, B + H + 1, "click"),
    (4L, 9L, B, "view"), (4L, 10L, B, "view"), // duplicate-ts views
    (4L, 11L, B + 1, "click"), (4L, 12L, B + 1, "click"), // duplicate-ts clicks
    (5L, 13L, B + 5, "purchase"))

  private def writeDir(): String = {
    val root = Files.createTempDirectory("funnel_spec")
    rows.toDF("user_id", "event_id", "ts", "event_type")
      .write.parquet(root.resolve("events.parquet").toString)
    root.toString
  }

  test("streaming funnel replay equals the batch exists-chain") {
    val dir = writeDir()
    val steps = Seq("view", "click", "purchase")
    val horizons = Seq(2 * H, 6 * H)
    val batch = graft.operators.Funnel.existsChain(
        graft.sources.Tables.tsNanosNormalized(
          spark.read.parquet(s"$dir/events.parquet")),
        steps, horizons)
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val stream = StreamFunnel.replayParquet(spark, dir, steps, horizons,
        queryName = "sf_spec")
      .toDF()
      .select(col("user_id"), col("counts")(0), col("counts")(1),
        col("counts")(2), col("depth"), col("first_conv_s"))
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(stream == batch)
    // sanity-pin the batch side itself: user 1 full chain, user 2 misses
    // the 2h click horizon, user 3's first click precedes any view,
    // user 4's duplicate timestamps collapse, user 5 never views
    assert(batch == Seq(
      (1L, 1L, 1L, 1L, 3L, (B + H) / 1000000000L),
      (2L, 1L, 0L, 0L, 1L, -1L),
      (3L, 1L, 1L, 0L, 2L, -1L),
      (4L, 1L, 1L, 0L, 2L, -1L)))
  }
}
