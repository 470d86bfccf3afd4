package graft.streaming

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state (SURVEY §2.9 extension):
  * per-user event sessions delimited by a `gapMinutes` inactivity gap,
  * maintained in a `flatMapGroupsWithState` keyed store with event-time
  * timeouts.
  *
  * Semantics match [[graft.operators.EventSeries.sessions]] exactly for
  * every CLOSED session: same (ts, event_id) ordering, same epoch-micro
  * bounds, same decimal(18,2)-per-event value sum (accumulated as long
  * cents, so the streaming fold equals the batch decimal sum in any
  * order). A session closes either when a later event of the same user
  * arrives past the gap, or when the event-time watermark passes its
  * end + gap (state timeout). Sessions still open at end-of-input stay
  * in state and are not emitted — the streaming/batch equivalence test
  * accounts for at most one open tail per user.
  *
  * Scale: state is one small record per ACTIVE user (bounded by the
  * timeout), shuffled by user key — the standard structured-streaming
  * sessionization shape.
  */
object Sessionize {

  /** `ts` carries the watermark metadata through to the stateful op
    * (projecting it away makes the checker reject event-time timeout);
    * the session logic itself uses the exact `ts_us` micros. */
  case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long,
                          cents: Long, ts: java.sql.Timestamp)
  case class SessionState(startUs: Long, endUs: Long, n: Long,
                          sumCents: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
                     n_events: Long, sum_value: Double)

  /** events: a (streaming) frame with ts TIMESTAMP, user_id, event_id,
    * value — e.g. [[StreamingIngest.readEvents]] output. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        // decimal(18,2) HALF_UP per event, held as long cents: the
        // streaming fold is order-free and equals the batch decimal sum
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        col("ts"))
      .as[SessionEvent]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(step(gapUs))
  }

  private def step(gapUs: Long)(
      userId: Long, it: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[Session] = {
    val out = ArrayBuffer.empty[Session]
    def close(s: SessionState): Unit =
      out += Session(userId, s.startUs, s.endUs, s.n, s.sumCents / 100.0)

    if (!it.hasNext) {
      // watermark passed end + gap with no new events: the session is
      // definitively closed (no on-time event can extend it)
      if (state.hasTimedOut) { state.getOption.foreach(close); state.remove() }
    } else {
      // batch iterators are unordered: restore the batch (ts, event_id)
      // order so gap detection matches EventSeries.sessions
      val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
      var st = state.getOption
      evs.foreach { e =>
        st = st match {
          case Some(s) if e.ts_us - s.endUs > gapUs =>
            close(s)
            Some(SessionState(e.ts_us, e.ts_us, 1L, e.cents))
          case Some(s) =>
            Some(SessionState(s.startUs, math.max(s.endUs, e.ts_us),
              s.n + 1, s.sumCents + e.cents))
          case None =>
            Some(SessionState(e.ts_us, e.ts_us, 1L, e.cents))
        }
      }
      // if the watermark already passed end + gap, no on-time event can
      // extend this session (any on-time ts ≥ watermark > end + gap
      // breaks the gap anyway) — close now; a timeout in the past is
      // rejected by the state store
      val timeoutMs = (st.get.endUs + gapUs) / 1000L + 1L
      if (timeoutMs <= state.getCurrentWatermarkMs()) {
        close(st.get)
        state.remove()
      } else {
        state.update(st.get)
        state.setTimeoutTimestamp(timeoutMs)
      }
    }
    out.iterator
  }
}
