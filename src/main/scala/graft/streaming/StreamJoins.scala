package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the stateful enrichment shape the reference's
  * single-stream pipeline can't express (its only "join" is the dedup
  * set-membership test). Spark buffers both sides in the state store; the
  * watermarks + time-range condition bound how long a row waits for its
  * match, which is what keeps state finite at 100 TB/day rates.
  */
object StreamJoins {

  /** Inner-join `left` to `right` rows of the same `key` whose event times
    * land within ±`window`. Both inputs need event-time columns named by
    * `leftTs`/`rightTs`; each side gets a `lateness` watermark, and Spark
    * derives the exact state-eviction bound (watermark + time range) from
    * the join condition — a row's buffered state drops as soon as no
    * in-window partner can still arrive.
    *
    * Output columns: the join key, both timestamps, and both payloads —
    * callers project further. Append-mode friendly: a pair emits exactly
    * once, when matched. */
  def enrichWithin(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      window: String = "30 seconds", lateness: String = "10 seconds"): DataFrame =
    enrichImpl(left, right, key, leftTs, rightTs, window, lateness, "inner")

  /** LEFT OUTER variant of [[enrichWithin]] — the harder semantics: an
    * unmatched left row cannot emit when it ARRIVES (its partner may
    * still come); it emits with NULL right columns only once the
    * watermark proves no in-window partner can ever arrive. That makes
    * null-emission timing a function of watermark progress, not data
    * order — the part teams get wrong when porting batch left joins to
    * streams (an outer result that "misses" rows usually just hasn't
    * crossed the watermark yet). Same state-eviction bound as the inner
    * form; the only extra cost is holding unmatched left rows until
    * expiry, which the watermark caps. */
  def enrichWithinOuter(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      window: String = "30 seconds", lateness: String = "10 seconds"): DataFrame =
    enrichImpl(left, right, key, leftTs, rightTs, window, lateness, "left_outer")

  /** FULL OUTER variant — both directions of [[enrichWithinOuter]]'s
    * contract at once: an unmatched row on EITHER side emits null-padded
    * for the other side's columns only after the watermark proves its
    * window empty. The join key is projected as `coalesce(left, right)`
    * so right-only rows still carry their key (the naive `.drop` of one
    * side's key column would null it for exactly those rows). State cost
    * is symmetric: both sides hold unmatched rows until watermark expiry. */
  def enrichWithinFull(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      window: String = "30 seconds", lateness: String = "10 seconds"): DataFrame =
    enrichImpl(left, right, key, leftTs, rightTs, window, lateness, "full_outer")

  /** Shared watermark + symmetric-interval condition for all join types —
    * one place to change the window semantics. */
  private def enrichImpl(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      window: String, lateness: String, joinType: String): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    val joined = l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $window") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $window"),
      joinType)
    if (joinType == "full_outer") {
      val others = left.columns.filterNot(_ == key).map(l(_)) ++
        right.columns.filterNot(_ == key).map(r(_))
      joined.select((coalesce(l(key), r(key)).as(key) +: others.toSeq): _*)
    } else joined.drop(r(key))
  }

  /** Stream-static enrichment: left-join each micro-batch against a
    * broadcast dimension table — the most common streaming join in
    * practice (events × user/device/geo metadata), and entirely STATELESS:
    * no watermark, no state store, nothing buffered across batches, so it
    * adds zero memory pressure at any rate.
    *
    * The explicit `broadcast` keeps the per-batch plan a map-side hash
    * join: the streaming side never shuffles, which matters because a
    * shuffle in a micro-batch is paid per TRIGGER, not per query. Spark
    * re-plans the static side every micro-batch — callers whose dimension
    * is expensive to produce (a join/agg, not a bare scan) should
    * `.cache()` it; a bare parquet dimension re-reads only footers and is
    * fine uncached (and picks up file-level updates between batches). */
  def enrichStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
