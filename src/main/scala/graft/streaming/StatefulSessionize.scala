package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state row of SURVEY §2.8's Spark mapping (the reference keeps its
  * incremental state in a SQL watermark table; a streaming deployment keeps
  * per-key session state in the state store instead).
  *
  * Sessions close when the gap to the next event exceeds `gapSeconds`.
  * Within a micro-batch events arrive unordered, so each invocation sorts
  * its group's events, folds them into the open session carried in
  * `GroupState`, emits every session that closed, and stores the still-open
  * one. State size is O(1) per key — safe at any scale.
  */
object StatefulSessionize {

  case class Event(user_id: Long, event_id: Long, tsMicros: Long, value: Double)
  case class OpenSession(startMicros: Long, lastMicros: Long, n: Long, total: Double)
  case class Session(user_id: Long, startMicros: Long, endMicros: Long,
    n_events: Long, total: Double)

  def sessionize(events: Dataset[Event], gapSeconds: Long,
      mode: OutputMode = OutputMode.Append()): Dataset[Session] = {
    val gapMicros = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        mode, GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[OpenSession]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.tsMicros - s.lastMicros <= gapMicros =>
                // min/max, NOT plain assignment: a late event from a LATER
                // micro-batch (older than the open session's frontier but
                // within the gap) must absorb into the session without
                // regressing its bounds — a plain `lastMicros = e.tsMicros`
                // would move the frontier backward, emitting end < start
                // sessions and splitting on the next on-time event
                // (r14 review). Within a batch the sort makes this a no-op.
                open = Some(OpenSession(math.min(s.startMicros, e.tsMicros),
                  math.max(s.lastMicros, e.tsMicros), s.n + 1,
                  s.total + e.value))
              case Some(s) =>
                closed += Session(userId, s.startMicros, s.lastMicros, s.n, s.total)
                open = Some(OpenSession(e.tsMicros, e.tsMicros, 1L, e.value))
              case None =>
                open = Some(OpenSession(e.tsMicros, e.tsMicros, 1L, e.value))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }(Encoders.product[OpenSession], Encoders.product[Session])
  }
}
