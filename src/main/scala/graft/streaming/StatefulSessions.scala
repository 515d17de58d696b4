package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization via `flatMapGroupsWithState` —
  * the custom-state counterpart of the batch `Relational.sessionize`
  * (gap-based sessions per user).
  *
  * State per user = the open (not-yet-closed) session. An event more
  * than `gapMs` after the open session's end closes it (emitted) and
  * opens a new one. Sessions still open at the end of input are emitted
  * by the final-batch flush (`AvailableNow` replay) — in a continuous
  * deployment they would be flushed by an event-time timeout instead;
  * that wiring point is marked below.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, event_id: Long, ts_ms: Long)
  final case class Session(user_id: Long, session_seq: Long, n_events: Long,
                           session_start_ms: Long, session_end_ms: Long)
  /** (open session, next seq number, buffered out-of-order events). */
  final case class UserState(open: Option[Session], buffered: List[Ev])

  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[UserState]) =>
          // micro-batch arrives unordered: merge with carried buffer, sort
          val prev = state.getOption.getOrElse(UserState(None, Nil))
          val evs = (prev.buffered ++ it).sortBy(e => (e.ts_ms, e.event_id))
          var open = prev.open
          var seq = open.map(_.session_seq).getOrElse(0L)
          val closed = List.newBuilder[Session]
          evs.foreach { e =>
            open match {
              case Some(s) if e.ts_ms - s.session_end_ms <= gapMs =>
                open = Some(s.copy(n_events = s.n_events + 1,
                  session_end_ms = math.max(s.session_end_ms, e.ts_ms)))
              case Some(s) =>
                closed += s
                seq += 1
                open = Some(Session(user, seq, 1L, e.ts_ms, e.ts_ms))
              case None =>
                seq += 1
                open = Some(Session(user, seq, 1L, e.ts_ms, e.ts_ms))
            }
          }
          // AvailableNow replay: flush the open session with the final
          // batch. Continuous deployments would instead keep it in state
          // and register an event-time timeout here.
          val out = closed.result() ++ open.toList
          state.update(UserState(None, Nil))
          out.iterator
      }
  }

  /** Replay the events parquet as a stream through the stateful plan. */
  def replayParquet(spark: SparkSession, dir: String, gapMs: Long,
                    queryName: String = "stateful_sessions"): Dataset[Session] = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val evs = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .selectExpr("user_id", "event_id", "ts DIV 1000000 AS ts_ms")
      .as[Ev]
    val q = sessionize(evs, gapMs).writeStream
      .outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).as[Session]
  }
}
