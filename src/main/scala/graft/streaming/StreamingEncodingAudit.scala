package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING encoding audit — the ingest-time form of the batch
  * `h_encoding_audit` detection census, and the NINETEENTH batch/stream
  * twin: a crawl pipeline counts byte-health artifacts (mojibake, U+FFFD
  * replacement chars, stray C0 controls, CRLF endings) AS DOCUMENTS
  * ARRIVE and maintains a standing per-(lang, source) ledger, so the
  * "did an upstream transcode just break / does this source need
  * re-fetching?" alarm reads off live state instead of waiting for the
  * batch census over the whole corpus.
  *
  * Mechanics: rows are pushed through the batch operator's EXACT
  * detection projection ([[graft.operators.CorpusOps.encDetect]] — one
  * shared implementation: two exact-substring probes, the RE2-safe
  * control class excluding \t \n \r, the CR probe), then keyed by
  * (lang, source). State per key:
  *  - `docSeen` — the doc-id idempotence ledger: an at-least-once REPLAY
  *    of a committed document touches no counter (the
  *    [[StreamingDomainRollup]] discipline);
  *  - `m` — five running longs (docs, mojibake, replacement, control,
  *    CRLF doc counts), maintained by O(1) transitions and emitted as
  *    one [[EncStat]] row per key per micro-batch that touched it.
  *
  * After the full corrupted corpus has streamed, the per-(lang, source)
  * row EQUALS the batch `h_encoding_audit`'s (n_docs, n_moji, n_repl,
  * n_ctrl, n_crlf) columns over the same corpus (spec-proven across
  * adversarial arrival order, a committed-wave replay, and a checkpoint
  * restart). The batch-only columns (`*_exact` / unhealthy_milli) are
  * synthesis-side facts: the ingest stream does not know what was
  * planted — the twin is the monitor, the batch op is the audit.
  *
  * Scale posture: detection is scan-local ahead of the shuffle; state is
  * ONE boolean per document (the idempotence ledger — the batch
  * distinct-aggregate's asymptotic footprint) plus 5 longs per
  * (lang, source); emission is O(1). Keying by (lang, source) matches
  * the census' own output cardinality; the ledger dominates and shards
  * with the docs.
  */
object StreamingEncodingAudit {

  final case class EncDoc(lang: String, source: String, docId: Long,
      mMoji: Long, mRepl: Long, mCtrl: Long, mCrlf: Long)
  final case class Moments(nDocs: Long, nMoji: Long, nRepl: Long,
      nCtrl: Long, nCrlf: Long)
  final case class EncStat(lang: String, source: String, nDocs: Long,
      nMoji: Long, nRepl: Long, nCtrl: Long, nCrlf: Long)

  class Processor extends StatefulProcessor[(String, String), EncDoc, EncStat] {

    @transient private var docSeen: MapState[Long, Boolean] = _
    @transient private var m: ValueState[Moments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      docSeen = getHandle.getMapState[Long, Boolean](
        "docSeen", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      m = getHandle.getValueState[Moments](
        "m", Encoders.product[Moments], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: (String, String), rows: Iterator[EncDoc],
        timerValues: TimerValues): Iterator[EncStat] = {
      var mm = if (m.exists()) m.get() else Moments(0L, 0L, 0L, 0L, 0L)
      rows.foreach { r =>
        // doc-level idempotence: a replayed committed document moves nothing
        if (!docSeen.containsKey(r.docId)) {
          docSeen.updateValue(r.docId, true)
          mm = Moments(mm.nDocs + 1, mm.nMoji + r.mMoji, mm.nRepl + r.mRepl,
            mm.nCtrl + r.mCtrl, mm.nCrlf + r.mCrlf)
        }
      }
      m.update(mm)
      Iterator.single(EncStat(key._1, key._2,
        mm.nDocs, mm.nMoji, mm.nRepl, mm.nCtrl, mm.nCrlf))
    }
  }

  /** Wire the audit onto a stream of arriving documents (doc_id LONG,
    * lang STRING, source STRING, text STRING — text as fetched, i.e.
    * already carrying whatever byte damage it carries). Emits one
    * [[EncStat]] row per (lang, source) a micro-batch touched. */
  def apply(stream: DataFrame): Dataset[EncStat] = {
    val spark = stream.sparkSession
    import spark.implicits._
    StreamingState.requireRocksDB(spark)
    graft.operators.CorpusOps.encDetect(stream)
      .selectExpr("lang", "source", "doc_id AS docId",
        "m_moji AS mMoji", "m_repl AS mRepl", "m_ctrl AS mCtrl", "m_crlf AS mCrlf")
      .as[EncDoc]
      .groupByKey(r => (r.lang, r.source))
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
