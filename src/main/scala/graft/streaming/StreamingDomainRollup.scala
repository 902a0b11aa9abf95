package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING registrable-domain rollup — the ingest-time form of the batch
  * `h_domain_rollup` audit, and the SEVENTEENTH batch/stream twin: a crawl
  * pipeline canonicalizes every fetched URL AS IT ARRIVES and maintains a
  * standing per-eTLD+1 ledger (docs, raw URLs, canonical URLs, hosts), so
  * the domain-cap decision ("is bbc.co.uk over its corpus share?") reads
  * off live state instead of waiting for a batch rollup over the whole
  * fetch log. The batch operator answers once per run; this answers
  * continuously, emitting one updated [[DomainStat]] row per registrable
  * domain per micro-batch that touched it.
  *
  * Mechanics: rows are pushed through the batch operator's EXACT
  * canonicalization projection ([[graft.operators.CorpusOps
  * .canonicalizeUrls]] — one shared implementation, not a re-statement),
  * then keyed by eTLD+1. State per domain:
  *  - `rawSeen` — the raw-URL idempotence ledger: an at-least-once REPLAY
  *    of a committed fetch touches no counter (the
  *    [[StreamingChao]]/[[StreamingStratifiedSampler]] discipline);
  *  - `canonSeen` / `hostSeen` / `docSeen` — distinct-ledgers for the
  *    three collapse counters;
  *  - `m` — the running (nDocs, nRaw, nCanon, nHosts) moments maintained
  *    by O(1) first-sighting transitions, so emission never iterates a
  *    map.
  *
  * After the full fetch log has streamed, the per-domain row EQUALS the
  * batch `h_domain_rollup`'s first five columns over the same corpus
  * (spec-proven across adversarial arrival order, a committed-wave
  * replay, and a checkpoint restart). The batch-only `share_milli` /
  * `cap_flag` columns divide by the GLOBAL corpus total — a cross-key
  * fact the per-domain processor deliberately does not hold; the cap
  * decision layer reads the emitted counts against the running total it
  * already tracks.
  *
  * Scale posture: state is the distinct-URL ledger per domain — the same
  * asymptotic footprint as the batch rollup's distinct-aggregate hash
  * tables, resident instead of rebuilt, sharded by the natural key
  * (domain) a crawl frontier already partitions on. The moments are 4
  * longs per domain; emission is O(1).
  */
object StreamingDomainRollup {

  final case class RawUrl(etld1: String, docId: Long, url: String,
      host: String, canonUrl: String)
  final case class Moments(nDocs: Long, nRaw: Long, nCanon: Long, nHosts: Long)
  final case class DomainStat(etld1: String, nDocs: Long, nRawUrls: Long,
      nCanonUrls: Long, nHosts: Long)

  class Processor extends StatefulProcessor[String, RawUrl, DomainStat] {

    @transient private var rawSeen: MapState[String, Boolean] = _
    @transient private var canonSeen: MapState[String, Boolean] = _
    @transient private var hostSeen: MapState[String, Boolean] = _
    @transient private var docSeen: MapState[Long, Boolean] = _
    @transient private var m: ValueState[Moments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      rawSeen = getHandle.getMapState[String, Boolean](
        "rawSeen", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
      canonSeen = getHandle.getMapState[String, Boolean](
        "canonSeen", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
      hostSeen = getHandle.getMapState[String, Boolean](
        "hostSeen", Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
      docSeen = getHandle.getMapState[Long, Boolean](
        "docSeen", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
      m = getHandle.getValueState[Moments](
        "m", Encoders.product[Moments], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[RawUrl],
        timerValues: TimerValues): Iterator[DomainStat] = {
      var mm = if (m.exists()) m.get() else Moments(0L, 0L, 0L, 0L)
      rows.foreach { r =>
        // each ledger counts on ITS OWN first sighting (round-19 advice):
        // gating doc/canon/host behind raw-URL idempotence silently dropped
        // a re-fetch of a seen URL under a NEW doc id — a shape real crawls
        // produce. Replayed identical rows still move nothing (every ledger
        // has seen every field), so at-least-once idempotence is preserved.
        if (!rawSeen.containsKey(r.url)) {
          rawSeen.updateValue(r.url, true)
          mm = mm.copy(nRaw = mm.nRaw + 1)
        }
        if (!canonSeen.containsKey(r.canonUrl)) {
          canonSeen.updateValue(r.canonUrl, true)
          mm = mm.copy(nCanon = mm.nCanon + 1)
        }
        if (!hostSeen.containsKey(r.host)) {
          hostSeen.updateValue(r.host, true)
          mm = mm.copy(nHosts = mm.nHosts + 1)
        }
        if (!docSeen.containsKey(r.docId)) {
          docSeen.updateValue(r.docId, true)
          mm = mm.copy(nDocs = mm.nDocs + 1)
        }
      }
      m.update(mm)
      Iterator.single(DomainStat(key, mm.nDocs, mm.nRaw, mm.nCanon, mm.nHosts))
    }
  }

  /** Wire the rollup onto a stream of fetched URLs (doc_id LONG,
    * url STRING). Emits one updated [[DomainStat]] per registrable domain
    * per micro-batch that delivered a row for it. */
  def apply(stream: DataFrame): Dataset[DomainStat] = {
    val spark = stream.sparkSession
    import spark.implicits._
    StreamingState.requireRocksDB(spark)
    graft.operators.CorpusOps.canonicalizeUrls(stream)
      .selectExpr("etld1", "doc_id AS docId", "url", "host", "canon_url AS canonUrl")
      .as[RawUrl]
      .groupByKey(_.etld1)
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
