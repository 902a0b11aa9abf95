package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.GraftFunctions

/** STREAMING capture-recapture duplicate estimation — the ingest-time form
  * of the batch `h_dup_chao` audit (Chao 1984), and the SIXTEENTH
  * batch/stream twin: a crawl pipeline keeps a cheap ~20 % record sample
  * flowing through a standing estimator, and at ANY moment can read off
  * "how many distinct texts does the corpus have / how much will dedup
  * save" without a full scan. The batch operator answers that question
  * once per run from a sample scan; this answers it continuously, emitting
  * one updated estimate row per language per micro-batch.
  *
  * Mechanics: rows are pre-filtered to the batch operator's EXACT sample
  * rule (first md5 byte of the doc_id decimal string < 51 — a per-RECORD
  * draw, so duplicate classes are sampled per copy), then keyed by lang.
  * State per language:
  *  - `seen` — the sampled doc_ids already counted (the idempotence
  *    ledger: an at-least-once REPLAY of a committed wave touches no
  *    counter, the [[StreamingStratifiedSampler]] discipline);
  *  - `counts` — sampled copies per text hash (fnv64a, the engine's dedup
  *    key);
  *  - `m` — the running moments (n_sampled, d_obs, f1, f2) maintained by
  *    O(1) count-transition updates (0→1: d_obs+1, f1+1; 1→2: f1−1,
  *    f2+1; 2→3: f2−1), so emission never iterates the map.
  *
  * The emitted estimate is the batch operator's bias-corrected integer
  * Chao1 bound `d_obs + f1·(f1−1) DIV (2·(f2+1))` — after the full corpus
  * has streamed, the per-lang (n_sampled, d_obs, f1, f2, chao_est) row
  * EQUALS `h_dup_chao`'s sample columns (spec-proven across adversarial
  * arrival order, a committed-wave replay, and a checkpoint restart).
  *
  * Scale posture: state is the sampled-record ledger — O(sample) =
  * O(0.2 × corpus) keys sharded by lang; the same asymptotic footprint
  * as the batch sample aggregate, resident instead of rebuilt (the
  * [[StreamingSimJoin]] standing-index trade). The moments are 4 longs
  * per language; emission is O(1).
  */
object StreamingChao {

  final case class SampledDoc(lang: String, docId: Long, th: Long)
  final case class Moments(nSampled: Long, dObs: Long, f1: Long, f2: Long)
  final case class ChaoEstimate(lang: String, nSampled: Long, dObs: Long,
      f1: Long, f2: Long, chaoEst: Long)

  class Processor extends StatefulProcessor[String, SampledDoc, ChaoEstimate] {

    @transient private var seen: MapState[Long, Boolean] = _
    @transient private var counts: MapState[Long, Long] = _
    @transient private var m: ValueState[Moments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState[Long, Boolean](
        "seen", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      counts = getHandle.getMapState[Long, Long](
        "counts", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      m = getHandle.getValueState[Moments](
        "m", Encoders.product[Moments], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[SampledDoc],
        timerValues: TimerValues): Iterator[ChaoEstimate] = {
      var mm = if (m.exists()) m.get() else Moments(0L, 0L, 0L, 0L)
      rows.foreach { r =>
        if (!seen.containsKey(r.docId)) {
          seen.updateValue(r.docId, true)
          val c = (if (counts.containsKey(r.th)) counts.getValue(r.th) else 0L) + 1L
          counts.updateValue(r.th, c)
          mm = mm.copy(nSampled = mm.nSampled + 1)
          if (c == 1L) mm = mm.copy(dObs = mm.dObs + 1, f1 = mm.f1 + 1)
          else if (c == 2L) mm = mm.copy(f1 = mm.f1 - 1, f2 = mm.f2 + 1)
          else if (c == 3L) mm = mm.copy(f2 = mm.f2 - 1)
        }
      }
      m.update(mm)
      Iterator.single(ChaoEstimate(key, mm.nSampled, mm.dObs, mm.f1, mm.f2,
        mm.dObs + mm.f1 * (mm.f1 - 1) / (2 * (mm.f2 + 1))))
    }
  }

  /** Wire the estimator onto a stream of documents (doc_id LONG,
    * text STRING, lang STRING). Emits one updated [[ChaoEstimate]] per
    * language per micro-batch that delivered a sampled row. */
  def apply(stream: DataFrame): Dataset[ChaoEstimate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    StreamingState.requireRocksDB(spark)
    stream
      .selectExpr("lang", "doc_id AS docId", "fnv64a(text) AS th",
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT) AS draw")
      .where("draw < 51")
      .selectExpr("lang", "docId", "th")
      .as[SampledDoc]
      .groupByKey(_.lang)
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
