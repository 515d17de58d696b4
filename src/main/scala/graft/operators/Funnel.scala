package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — the product-analytics
  * primitive next to sessionization (q19) and retention cohorts (q163):
  * how many users complete step 1 → step 2 → … where each step must
  * happen AFTER a qualifying occurrence of the previous step and within
  * a per-step horizon.
  *
  * Semantics are the standard exists-chain form (any qualifying chain
  * counts, not just the first occurrence of step 1): an event qualifies
  * for step i+1 iff some event already qualified for step i strictly
  * before it and no more than `horizon(i)` earlier. Reference behavior:
  * IHOP's query surface composes per-step filters + joins the same way
  * (ihop/import_data.py filter/join primitives); the funnel itself is a
  * standard analytics composite.
  *
  * Scale design: one equi-join per step on the user key with a range
  * predicate whose width is the step horizon — the same bounded-state
  * interval-join shape as the stream-stream attribution join (x41), so
  * state per user is horizon-bounded, never corpus-bounded. Each step's
  * qualified set is deduplicated (DISTINCT on (user, ts)) before
  * feeding the next step, keeping join fanout ∝ qualified events, and
  * every shuffle is keyed on `user_id` so AQE reuses the partitioning
  * across steps. No window over the corpus, no driver state.
  */
object Funnel {

  /** Per-step qualified event sets chained with per-step horizons.
    *
    * @param events   event table with `user_id`, `ts` (BIGINT nanos),
    *                 and `event_type`
    * @param steps    ordered event types, e.g. Seq("view","click","purchase")
    * @param horizonsNs per-transition max gap in nanoseconds
    *                 (length = steps.length - 1)
    * @return one row per user who reached step 1, with per-step
    *         qualified-event counts, the funnel depth reached, and the
    *         epoch-second stamp of the earliest final-step conversion
    *         (-1 when the user never converts).
    */
  def existsChain(events: DataFrame, steps: Seq[String],
      horizonsNs: Seq[Long]): DataFrame = {
    require(steps.length >= 2 && horizonsNs.length == steps.length - 1,
      s"need >=2 steps and one horizon per transition")
    val typed = steps.map(t =>
      events.where(col("event_type") === t).select(col("user_id"), col("ts")))
    // step 0 qualifies unconditionally; each later step i joins on the
    // previous qualified set within its horizon
    val qualified: Seq[DataFrame] = typed.indices.tail
      .scanLeft(typed.head.distinct()) { (prev, i) =>
        typed(i).as("e")
          .join(prev.as("q"),
            col("e.user_id") === col("q.user_id") &&
              col("q.ts") < col("e.ts") &&
              col("e.ts") <= col("q.ts") + lit(horizonsNs(i - 1)))
          .select(col("e.user_id").as("user_id"), col("e.ts").as("ts"))
          .distinct()
      }
    val perStep = qualified.zipWithIndex.map { case (df, i) =>
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as(s"n_step${i + 1}"),
          min(col("ts")).as(s"_first${i + 1}"))
    }
    val joined = perStep.tail.foldLeft(perStep.head)((a, b) =>
      a.join(b, Seq("user_id"), "left"))
    val depth = steps.indices.tail.foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(s"n_step${i + 1}").isNotNull, 1L).otherwise(0L)
    }
    val lastIdx = steps.length
    joined
      .withColumn("depth", depth)
      .withColumn("first_conv_s",
        coalesce(expr(s"_first$lastIdx DIV 1000000000"), lit(-1L)))
      .select(Seq(col("user_id")) ++
        steps.indices.map(i => coalesce(col(s"n_step${i + 1}"), lit(0L))
          .as(s"n_step${i + 1}")) ++
        Seq(col("depth"), col("first_conv_s")): _*)
  }
}
