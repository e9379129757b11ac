package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's "live database"
  * side (SURVEY §2 S1-S4; S5 in DocStreams): the reference mutates a graph store online
  * (add_node/add_edge streams, benchmark.py); the Spark-native equivalent
  * is an event stream with watermarked, stateful operators.
  *
  * All operators take an unbounded DataFrame (readStream or MemoryStream)
  * and return a transformed unbounded DataFrame; tests drive them with
  * MemoryStream + processAllAvailable.
  */
object EventStreams {

  /** Event row shape used by the typed stateful operators. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** S1: event-time tumbling window aggregation with a watermark — late
    * data beyond 1 hour is dropped, window state is bounded. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** S2: gap-based streaming sessionization via flatMapGroupsWithState —
    * a session closes when no event arrives for 30 minutes (event time);
    * closed sessions are emitted in Append mode on watermark advance. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.last, s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // min/max, not overwrite: a within-watermark LATE event
                  // (t < s.last, delivered in a later micro-batch) must
                  // extend the session backwards, never drag `last`
                  // before `start` (which would emit end < start and
                  // split sessions whose true gaps are within bounds)
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed += Session(user, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** S3: stream-static dimension enrichment — the static side is broadcast
    * to every micro-batch; no stream-side shuffle. */
  def enrich(events: DataFrame, dim: DataFrame, streamKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** S4: streaming exact dedup — dropDuplicates on event_id with a
    * watermark bounding the dedup state. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
}
