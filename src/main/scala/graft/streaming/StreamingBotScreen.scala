package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING bot-regularity screen — the ingest-time form of the batch
  * `g_bot_regularity` census. Per user, a constant-size running summary
  * of the inter-event-gap distribution is maintained while events
  * arrive: (last event time, event count, gap count, Σg, Σg²) with the
  * batch query's exact gap rule (second-granularity, clamped to
  * [0 s, 1 h]). The per-user CV² bucket — `⌊100·(n·Σg² − (Σg)²)/(Σg)²⌋`
  * capped at 10, all integer cross-multiplication — is re-emitted on
  * every micro-batch that touches the user, so a fraud/abuse consumer
  * sees a user's regularity class drift toward "metronome" live, instead
  * of at the nightly batch audit.
  *
  * Equivalence contract: gap accumulation is a FOLD over the user's
  * event-time order, and [[foldRun]] is associative over ordered
  * concatenation — folding any consecutive chunking of the (tus,
  * event_id)-sorted sequence equals folding it whole
  * (property-tested in StreamingBotScreenSpec). So when each user's
  * events ARRIVE in event-time order — what a Kafka source partitioned
  * by user_id delivers — the streaming summary equals the batch query on
  * the same rows after every micro-batch, across any batch boundaries.
  * Cross-boundary ties and late (time-regressing) arrivals fall outside
  * that guarantee: a late row contributes exactly one zero gap — its own
  * gap clamps to 0 and the fold frontier advances monotonically
  * (`max(last_tus, tus)`), so the NEXT in-order row's gap is undistorted
  * — and exact repair needs the batch pass (the standard streaming/batch
  * split every summary in this engine documents).
  *
  * Scale posture: state is ONE fixed-width row per user — no per-event
  * history — hash-partitioned across executors by user_id, the same
  * skew-free key the batch window rides; per-row work is O(1). The
  * 1-hour clamp keeps every quantity BIGINT-exact to ~8·10⁴ events/user
  * (see the batch Scaladoc's bound).
  */
object StreamingBotScreen {

  final case class EventRow(event_id: Long, user_id: Long, tus: Long)

  /** The mergeable per-user summary. `last_tus` is the fold frontier;
    * the other four fields are the pure accumulators the CV² formula
    * reads. */
  final case class RunStats(
      last_tus: Long, n_events: Long, n_gaps: Long, sg: Long, sg2: Long)

  /** Latest per-user regularity class; `cv2_bucket = -1` until the user
    * clears the batch query's ≥ 5-gap support threshold. */
  final case class UserRegularity(
      user_id: Long, n_events: Long, n_gaps: Long, sg: Long, sg2: Long,
      cv2_bucket: Long)

  val GapClampSeconds = 3600L
  val MinGaps = 5L

  /** Fold a (tus, event_id)-sorted run of events into the summary —
    * the batch query's lag-window gap rule, expressed as the associative
    * step the stream applies per micro-batch: for any consecutive split
    * of a sorted sequence, `foldRun(foldRun(s, a), b) = foldRun(s, a ++ b)`
    * (by construction: each step reads only the frontier `last_tus`). */
  def foldRun(state: Option[RunStats], sorted: Seq[EventRow]): Option[RunStats] =
    sorted.foldLeft(state) { (acc, e) =>
      acc match {
        case None => Some(RunStats(e.tus, 1L, 0L, 0L, 0L))
        case Some(s) =>
          // batch rule: g = least((tus - prev) DIV 1e6, 3600); the
          // max(0, ·) guard only fires on out-of-order arrivals, which
          // the batch (sorted) form never produces. The frontier advances
          // MONOTONICALLY: a late (time-regressing) row contributes one
          // zero gap and leaves the frontier where it was — moving it
          // backward would also inflate the NEXT in-order row's gap, so
          // one late row would corrupt two gaps
          val g = math.min(
            math.max((e.tus - s.last_tus) / 1000000L, 0L), GapClampSeconds)
          Some(RunStats(math.max(s.last_tus, e.tus),
            s.n_events + 1, s.n_gaps + 1, s.sg + g, s.sg2 + g * g))
      }
    }

  /** The batch query's exact bucket arithmetic: ⌊100·CV²⌋ capped at 10,
    * numerator n·Σg² − (Σg)² ≥ 0 by Cauchy–Schwarz so truncating `/`
    * matches SQL DIV. */
  def bucket(nGaps: Long, sg: Long, sg2: Long): Long =
    if (sg == 0L) 0L
    else math.min(100L * (nGaps * sg2 - sg * sg) / (sg * sg), 10L)

  class Processor
      extends StatefulProcessor[Long, EventRow, UserRegularity] {

    @transient private var run: ValueState[RunStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      run = getHandle.getValueState[RunStats](
        "run", Encoders.product[RunStats], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[UserRegularity] = {
      val sorted = rows.toVector.sortBy(e => (e.tus, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val prior = if (run.exists()) Some(run.get()) else None
      val next = foldRun(prior, sorted).get
      run.update(next)
      Iterator.single(UserRegularity(
        key, next.n_events, next.n_gaps, next.sg, next.sg2,
        if (next.n_gaps >= MinGaps) bucket(next.n_gaps, next.sg, next.sg2)
        else -1L))
    }
  }

  /** Wire the screen onto a stream of events
    * (event_id LONG, user_id LONG, tus LONG epoch-micros). Emits an
    * updated [[UserRegularity]] per touched user per micro-batch. */
  def apply(stream: DataFrame): Dataset[UserRegularity] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      .select("event_id", "user_id", "tus")
      .as[EventRow]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
