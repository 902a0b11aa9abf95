package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING SESSIONIZATION — the ingest-time form of the batch
  * `g_sessionize` gaps-and-islands build (30-minute inactivity rule), and
  * the FOURTEENTH batch/stream twin. Per user the state holds exactly the
  * OPEN session (island id, entry type, start, event count, last-activity
  * frontier); every incoming event either extends the open session
  * (gap ≤ 30 min) or CLOSES it — emitting the finished session row, with
  * the batch query's exact shape (entry type = the island's first event,
  * duration = last − first), the micro-batch the closing event arrives
  * instead of at the nightly sessionization rebuild. The session census a
  * product-analytics consumer maintains from the emitted rows is
  * `g_sessionize`'s declared report, row for row (spec-proven rollup
  * equality).
  *
  * Equivalence contract: session assembly is a FOLD over the user's
  * canonical (tus, event_id) order, and [[foldRun]] is associative over
  * ordered concatenation — each step reads only the open-session state
  * (StreamingSessionizeSpec proves chunking-invariance by property). So
  * when each user's events arrive in event-time order — what a Kafka
  * source partitioned by user_id delivers; within a micro-batch the
  * processor sorts, so only CROSS-batch disorder matters — the union of
  * emitted closed sessions equals the batch query's non-final islands on
  * the same events across any micro-batch boundaries, and the in-state
  * open session equals each user's final island.
  *
  * Redelivery contract: the frontier is MONOTONE — a row at
  * (tus, event_id) ≤ the frontier is dropped, so at-least-once
  * redelivery of any processed prefix changes nothing: closed sessions
  * are replay-exact (never re-emitted, counts never double). A genuinely
  * LATE row (new id but regressed time) is likewise dropped rather than
  * retroactively bridging two already-separated sessions — the streaming
  * arm's declared approximation; exact repair is the batch rebuild (the
  * engine's standard streaming/batch split, the StreamingScd2 posture).
  *
  * Scale posture: state is ONE fixed-width row per user — the open
  * session only, never session history (history lives in the sink) —
  * hash-partitioned by user_id, the same skew-free key the batch window
  * rides; per-row work is O(1). */
object StreamingSessionize {

  /** The batch query's 30-minute inactivity rule, in epoch-micros. */
  val GapUs: Long = 1800000000L

  final case class EventRow(event_id: Long, user_id: Long, tus: Long, event_type: String)

  /** The open session + fold frontier. */
  final case class OpenSession(
      sid: Long, entry_type: String, start_tus: Long, n_events: Long,
      last_tus: Long, last_event_id: Long)

  /** A closed session — islands carry the batch query's shape: entry type,
    * [start, end] activity bounds, event count. */
  final case class ClosedSession(
      user_id: Long, sid: Long, entry_type: String,
      start_tus: Long, end_tus: Long, n_events: Long)

  /** Fold a (tus, event_id)-sorted run into (closed sessions, new open
    * session). Associative over ordered concatenation: each step reads
    * only the open-session accumulator, so folding any consecutive
    * chunking of a sorted sequence emits the same closures in the same
    * order and lands on the same open session. Rows at or behind the
    * frontier are dropped (replay/late suppression). */
  def foldRun(userId: Long, state: Option[OpenSession], sorted: Seq[EventRow])
      : (Vector[ClosedSession], Option[OpenSession]) =
    sorted.foldLeft((Vector.empty[ClosedSession], state)) { case ((out, acc), e) =>
      acc match {
        case None =>
          (out, Some(OpenSession(1L, e.event_type, e.tus, 1L, e.tus, e.event_id)))
        case Some(s) if e.tus < s.last_tus ||
            (e.tus == s.last_tus && e.event_id <= s.last_event_id) =>
          (out, acc) // replayed or late: behind the monotone frontier
        case Some(s) if e.tus - s.last_tus > GapUs =>
          (out :+ ClosedSession(userId, s.sid, s.entry_type, s.start_tus, s.last_tus, s.n_events),
            Some(OpenSession(s.sid + 1, e.event_type, e.tus, 1L, e.tus, e.event_id)))
        case Some(s) =>
          (out, Some(s.copy(n_events = s.n_events + 1,
            last_tus = e.tus, last_event_id = e.event_id)))
      }
    }

  class Processor extends StatefulProcessor[Long, EventRow, ClosedSession] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toVector.sortBy(e => (e.tus, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val prior = if (open.exists()) Some(open.get()) else None
      val (closed, next) = foldRun(key, prior, sorted)
      next.foreach(open.update)
      closed.iterator
    }
  }

  /** Wire the build onto a stream of events (event_id LONG, user_id LONG,
    * tus LONG epoch-micros, event_type STRING). Emits each closed session
    * exactly once, the micro-batch its closing event arrives. */
  def apply(stream: DataFrame): Dataset[ClosedSession] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      .select("event_id", "user_id", "tus", "event_type")
      .as[EventRow]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
