package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING SCD2 state-history build — the ingest-time form of the batch
  * `g_scd2_state` gaps-and-islands query, and the NINTH batch/stream twin.
  * Per user the state holds exactly the OPEN interval (version, state,
  * valid_from, event count) plus the (tus, event_id) fold frontier; every
  * incoming event either extends the open interval (same event_type) or
  * CLOSES it — emitting the finished `[valid_from, valid_to)` row the
  * moment the state change happens, instead of at the nightly batch
  * rebuild. A dimension consumer (the lakehouse MERGE that maintains the
  * SCD2 table) applies the emitted closures append-only; the single open
  * interval per user lives in state until its closing event arrives.
  *
  * Equivalence contract: closure emission is a FOLD over the user's
  * canonical (tus, event_id) order, and [[foldRun]] is associative over
  * ordered concatenation — each step reads only the open-interval state
  * (StreamingScd2Spec proves chunking-invariance by property). So when
  * each user's events arrive in event-time order — what a Kafka source
  * partitioned by user_id delivers; within a micro-batch the processor
  * sorts, so only CROSS-batch disorder matters — the union of all emitted
  * closures equals the batch query's `is_current = 0` rows on the same
  * events, across any micro-batch boundaries, and the in-state open
  * interval equals the batch `is_current = 1` row.
  *
  * Redelivery contract: the frontier is MONOTONE — a row at
  * (tus, event_id) ≤ the frontier is dropped, so at-least-once
  * redelivery of any processed prefix changes nothing: closures are
  * replay-exact (never re-emitted, counts never double). A genuinely
  * LATE row (new id but regressed time) is likewise dropped rather than
  * retroactively splitting an already-closed interval — the streaming
  * arm's declared approximation; exact repair is the batch rebuild (the
  * engine's standard streaming/batch split).
  *
  * Scale posture: state is ONE fixed-width row per user — the open
  * interval only, never interval history (history lives in the sink) —
  * hash-partitioned by user_id, the same skew-free key the batch window
  * rides; per-row work is O(1). */
object StreamingScd2 {

  final case class EventRow(event_id: Long, user_id: Long, tus: Long, event_type: String)

  /** The open interval + fold frontier. */
  final case class OpenInterval(
      version: Long, state: String, valid_from: Long, n_events: Long,
      last_tus: Long, last_event_id: Long)

  /** A closed interval — schema-aligned with the batch query's
    * `is_current = 0` rows (valid_to = the closing event's tus). */
  final case class ClosedInterval(
      user_id: Long, version: Long, state: String,
      valid_from: Long, valid_to: Long, n_events: Long)

  /** Fold a (tus, event_id)-sorted run into (closures, new open state).
    * Associative over ordered concatenation: each step reads only the
    * open-interval accumulator, so folding any consecutive chunking of a
    * sorted sequence emits the same closures in the same order and lands
    * on the same open interval. Rows at or behind the frontier are
    * dropped (replay/late suppression). */
  def foldRun(userId: Long, state: Option[OpenInterval], sorted: Seq[EventRow])
      : (Vector[ClosedInterval], Option[OpenInterval]) =
    sorted.foldLeft((Vector.empty[ClosedInterval], state)) { case ((out, acc), e) =>
      acc match {
        case None =>
          (out, Some(OpenInterval(1L, e.event_type, e.tus, 1L, e.tus, e.event_id)))
        case Some(s) if e.tus < s.last_tus ||
            (e.tus == s.last_tus && e.event_id <= s.last_event_id) =>
          (out, acc) // replayed or late: behind the monotone frontier
        case Some(s) if e.event_type == s.state =>
          (out, Some(s.copy(n_events = s.n_events + 1,
            last_tus = e.tus, last_event_id = e.event_id)))
        case Some(s) =>
          (out :+ ClosedInterval(userId, s.version, s.state, s.valid_from, e.tus, s.n_events),
            Some(OpenInterval(s.version + 1, e.event_type, e.tus, 1L, e.tus, e.event_id)))
      }
    }

  class Processor extends StatefulProcessor[Long, EventRow, ClosedInterval] {

    @transient private var open: ValueState[OpenInterval] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenInterval](
        "open", Encoders.product[OpenInterval], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[ClosedInterval] = {
      val sorted = rows.toVector.sortBy(e => (e.tus, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val prior = if (open.exists()) Some(open.get()) else None
      val (closed, next) = foldRun(key, prior, sorted)
      next.foreach(open.update)
      closed.iterator
    }
  }

  /** Wire the build onto a stream of events (event_id LONG, user_id LONG,
    * tus LONG epoch-micros, event_type STRING). Emits each closed
    * interval exactly once, the micro-batch its closing event arrives. */
  def apply(stream: DataFrame): Dataset[ClosedInterval] = {
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
