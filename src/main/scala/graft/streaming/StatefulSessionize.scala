package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization via
  * flatMapGroupsWithState (SURVEY §2 №36's stateful form). A closed
  * session is emitted as soon as a later event arrives past the gap;
  * the open session stays in state (production would add an event-time
  * timeout to flush idle users — kept minimal here).
  */
object StatefulSessionize {

  final case class Ev(user_id: Long, ts_ms: Long)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)
  final case class SessState(start: Long, end: Long, n: Long)

  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          var closed = List.empty[Session]
          var st = state.getOption
          evs.toSeq.sortBy(e => (e.ts_ms, 0L)).foreach { e =>
            st = st match {
              case Some(s) if e.ts_ms - s.end > gapMs =>
                closed ::= Session(uid, s.start, s.end, s.n)
                Some(SessState(e.ts_ms, e.ts_ms, 1))
              case Some(s) =>
                Some(SessState(s.start, math.max(s.end, e.ts_ms), s.n + 1))
              case None =>
                Some(SessState(e.ts_ms, e.ts_ms, 1))
            }
          }
          st.foreach(state.update)
          closed.reverse.iterator
      }
  }
}
