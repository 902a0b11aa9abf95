package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING last-touch attribution — the ingest-time form of the batch
  * `g_attribution` union-and-carry query, and the TWELFTH batch/stream
  * twin. Per user the state holds exactly the carried value the batch
  * window computes — the most recent click's timestamp — plus the fold
  * frontier; every purchase emits its attribution verdict (last click
  * within the 7-day lookback?) the micro-batch it arrives, instead of at
  * the nightly replay. The marketing consumer aggregates the emitted
  * per-purchase rows into the daily attribution rate with plain SQL —
  * the same rollup `g_attribution` reports.
  *
  * Equivalence contract: the batch query carries `last(c_tus) IGNORE
  * NULLS` over the per-user canonical order (tus, kind, event_id) with
  * clicks (kind 0) ordered BEFORE purchases (kind 1) at equal
  * timestamps; [[foldRun]] folds the identical order and reads only the
  * carried-click accumulator, and is associative over ordered
  * concatenation (StreamingAttributionSpec proves chunking-invariance by
  * property). So when each user's events arrive in event-time order —
  * what a user_id-partitioned Kafka source delivers; within a
  * micro-batch the processor sorts, so only CROSS-batch disorder
  * matters — the emitted attribution rows equal the batch per-purchase
  * verdicts exactly, across any micro-batch boundaries.
  *
  * Redelivery contract: the frontier is MONOTONE in (tus, kind,
  * event_id) — a replayed row falls at or behind it and is dropped, so
  * at-least-once redelivery changes nothing: every purchase's verdict is
  * emitted exactly once and never double-counts. A genuinely LATE row
  * (new id, regressed time) is likewise dropped rather than
  * retroactively re-attributing purchases already emitted — the
  * streaming arm's declared approximation; exact repair is the batch
  * replay (the engine's standard streaming/batch split).
  *
  * Scale posture: state is ONE fixed-width row per user (the carried
  * click + frontier — never a click history), hash-partitioned by
  * user_id, the same skew-free key the batch window rides; per-row work
  * is O(1). Reference cite: the dedup/ack pipeline shape this engine
  * generalizes is main.go:38-141; attribution itself is engine surface
  * beyond the reference. */
object StreamingAttribution {

  final case class TouchRow(event_id: Long, user_id: Long, tus: Long, event_type: String)

  /** Carried last click + monotone fold frontier. kind: click = 0,
    * purchase = 1 — the batch carry's tie order at equal timestamps. */
  final case class CarryState(
      last_click_tus: Long, // -1 = no click seen yet
      f_tus: Long, f_kind: Int, f_event_id: Long)

  /** One emitted verdict per purchase — `day`/`attributed` aggregate to
    * exactly the batch `g_attribution` daily rollup. click_tus = -1 when
    * no click preceded the purchase. */
  final case class Attribution(
      user_id: Long, event_id: Long, tus: Long, day: Long,
      attributed: Boolean, click_tus: Long)

  val LookbackUs: Long = 604800000000L // 7 days

  private def kindOf(eventType: String): Int = if (eventType == "click") 0 else 1

  /** Fold a (tus, kind, event_id)-sorted run into (verdicts, new state).
    * Associative over ordered concatenation: each step reads only the
    * carried accumulator, so folding any consecutive chunking of a
    * sorted sequence emits the same verdicts in the same order and lands
    * on the same carry. Rows at or behind the frontier are dropped
    * (replay/late suppression). */
  def foldRun(state: Option[CarryState], sorted: Seq[TouchRow])
      : (Vector[Attribution], Option[CarryState]) =
    sorted.foldLeft((Vector.empty[Attribution], state)) { case ((out, acc), e) =>
      val k = kindOf(e.event_type)
      val behind = acc.exists { s =>
        e.tus < s.f_tus ||
          (e.tus == s.f_tus && (k < s.f_kind ||
            (k == s.f_kind && e.event_id <= s.f_event_id)))
      }
      if (behind) (out, acc)
      else {
        val lastClick = acc.map(_.last_click_tus).getOrElse(-1L)
        if (k == 0)
          (out, Some(CarryState(e.tus, e.tus, 0, e.event_id)))
        else {
          val attributed = lastClick >= 0 && e.tus - lastClick <= LookbackUs
          (out :+ Attribution(e.user_id, e.event_id, e.tus,
            e.tus / 86400000000L, attributed, lastClick),
            Some(CarryState(lastClick, e.tus, 1, e.event_id)))
        }
      }
    }

  class Processor extends StatefulProcessor[Long, TouchRow, Attribution] {

    @transient private var carry: ValueState[CarryState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      carry = getHandle.getValueState[CarryState](
        "carry", Encoders.product[CarryState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[TouchRow],
        timerValues: TimerValues): Iterator[Attribution] = {
      val sorted = rows.toVector
        .filter(e => e.event_type == "click" || e.event_type == "purchase")
        .sortBy(e => (e.tus, kindOf(e.event_type), e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val prior = if (carry.exists()) Some(carry.get()) else None
      val (verdicts, next) = foldRun(prior, sorted)
      next.foreach(carry.update)
      verdicts.iterator
    }
  }

  /** Wire attribution onto a stream of events (event_id LONG, user_id
    * LONG, tus LONG epoch-micros, event_type STRING). Non-touch event
    * types are ignored; each purchase's verdict is emitted exactly once,
    * the micro-batch it arrives. */
  def apply(stream: DataFrame): Dataset[Attribution] = {
    val spark = stream.sparkSession
    import spark.implicits._
    StreamingState.requireRocksDB(spark)
    stream
      .select("event_id", "user_id", "tus", "event_type")
      .as[TouchRow]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
