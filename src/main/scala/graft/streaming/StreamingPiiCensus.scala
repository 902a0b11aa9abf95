package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING PII census — the ingest-time form of the batch
  * `h_pii_census` detection audit, and the EIGHTEENTH batch/stream twin:
  * a governance pipeline counts PII-shaped spans AS DOCUMENTS ARRIVE and
  * maintains a standing per-(lang, pattern) ledger (docs hit, hits,
  * matched span chars, post-scrub residuals), so the "is this crawl
  * leaking PII / is the scrub holding?" alarm reads off live state
  * instead of waiting for the batch census over the whole corpus.
  *
  * Mechanics: rows are pushed through the batch operator's EXACT
  * detection projection ([[graft.operators.GovernanceOps.piiDetect]] —
  * one shared implementation: three RE2-safe detectors, the tag scrub,
  * and the residual re-detection), then keyed by lang. State per lang:
  *  - `docSeen` — the doc-id idempotence ledger: an at-least-once REPLAY
  *    of a committed document touches no counter (the
  *    [[StreamingDomainRollup]] discipline);
  *  - `m` — the running per-pattern (docsHit, hits, spanChars, resid)
  *    moments, maintained by O(1) transitions, emitted as three
  *    [[PiiStat]] rows (email/phone/id) per micro-batch that touched the
  *    language.
  *
  * After the full planted corpus has streamed, the per-(lang, pattern)
  * row EQUALS the batch `h_pii_census`'s (n_docs_hit, n_hits,
  * span_chars, n_resid) columns over the same corpus (spec-proven across
  * adversarial arrival order, a committed-wave replay, and a checkpoint
  * restart). The batch-only columns (n_planted / detect_exact /
  * density_milli) are synthesis-side facts: the ingest stream does not
  * know what was planted, which is exactly why the batch census exists —
  * the twin is the monitor, the batch op is the audit.
  *
  * Scale posture: detection is scan-local ahead of the shuffle; state is
  * ONE boolean per document (the idempotence ledger — the same
  * asymptotic footprint as the batch distinct-aggregate) plus 12 longs
  * per language; emission is O(1). Keying by lang matches the ≤|langs|
  * output cardinality; the ledger dominates and shards with the docs.
  */
object StreamingPiiCensus {

  final case class PiiDoc(lang: String, docId: Long,
      nEmail: Long, nPhone: Long, nId: Long,
      spEmail: Long, spPhone: Long, spId: Long,
      rEmail: Long, rPhone: Long, rId: Long)
  final case class Moments(
      dhE: Long, nE: Long, spE: Long, rE: Long,
      dhP: Long, nP: Long, spP: Long, rP: Long,
      dhI: Long, nI: Long, spI: Long, rI: Long)
  final case class PiiStat(lang: String, pattern: String,
      nDocsHit: Long, nHits: Long, spanChars: Long, nResid: Long)

  class Processor extends StatefulProcessor[String, PiiDoc, PiiStat] {

    @transient private var docSeen: MapState[Long, Boolean] = _
    @transient private var m: ValueState[Moments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      docSeen = getHandle.getMapState[Long, Boolean](
        "docSeen", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      m = getHandle.getValueState[Moments](
        "m", Encoders.product[Moments], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[PiiDoc],
        timerValues: TimerValues): Iterator[PiiStat] = {
      var mm = if (m.exists()) m.get()
        else Moments(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
      rows.foreach { r =>
        // doc-level idempotence: a replayed committed document moves nothing
        if (!docSeen.containsKey(r.docId)) {
          docSeen.updateValue(r.docId, true)
          mm = mm.copy(
            dhE = mm.dhE + (if (r.nEmail > 0) 1 else 0), nE = mm.nE + r.nEmail,
            spE = mm.spE + r.spEmail, rE = mm.rE + r.rEmail,
            dhP = mm.dhP + (if (r.nPhone > 0) 1 else 0), nP = mm.nP + r.nPhone,
            spP = mm.spP + r.spPhone, rP = mm.rP + r.rPhone,
            dhI = mm.dhI + (if (r.nId > 0) 1 else 0), nI = mm.nI + r.nId,
            spI = mm.spI + r.spId, rI = mm.rI + r.rId)
        }
      }
      m.update(mm)
      Iterator(
        PiiStat(key, "email", mm.dhE, mm.nE, mm.spE, mm.rE),
        PiiStat(key, "phone", mm.dhP, mm.nP, mm.spP, mm.rP),
        PiiStat(key, "id", mm.dhI, mm.nI, mm.spI, mm.rI))
    }
  }

  /** Wire the census onto a stream of arriving documents (doc_id LONG,
    * lang STRING, text STRING — text as fetched, i.e. already carrying
    * whatever PII it carries). Emits the three per-pattern [[PiiStat]]
    * rows for each language a micro-batch touched. */
  def apply(stream: DataFrame): Dataset[PiiStat] = {
    val spark = stream.sparkSession
    import spark.implicits._
    StreamingState.requireRocksDB(spark)
    graft.operators.GovernanceOps.piiDetect(stream)
      .selectExpr("lang", "doc_id AS docId",
        "n_email AS nEmail", "n_phone AS nPhone", "n_id AS nId",
        "sp_email AS spEmail", "sp_phone AS spPhone", "sp_id AS spId",
        "r_email AS rEmail", "r_phone AS rPhone", "r_id AS rId")
      .as[PiiDoc]
      .groupByKey(_.lang)
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
