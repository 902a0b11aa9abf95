package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** STREAMING exact set-similarity join — the tenth batch/stream twin: the
  * ingest-time form of the batch `h_simjoin_prefix` AllPairs/PPJoin
  * (Bayardo et al. WWW 2007), and the engine's expression of the
  * distributed STREAMING set-similarity-join problem (ICDE 2020 family).
  * Where [[StreamingNearDup]] answers the same question probabilistically
  * (MinHash-LSH banding, tunable recall), this twin is EXACT: every pair
  * of documents at 3-gram Jaccard ≥ 0.6 — across any micro-batch
  * boundaries and any arrival order — is emitted with its exact
  * `jac_milli`, no false negatives, verified against the batch join.
  *
  * How exactness survives streaming: the prefix filter only needs a FIXED
  * total order over grams, not the batch side's global document-frequency
  * order (rarity ordering is a candidate-volume optimization, never a
  * correctness condition) — so the stream orders each signature by the
  * gram's 60-bit md5-prefix hash VALUE, a data-independent order every
  * arrival agrees on forever. Each document enrolls in the state-resident
  * inverted index under its PREFIX grams (`plen = n − ⌈0.6n⌉ + 1`
  * smallest hashes) and probes with its FULL gram set.
  *
  * COMPLETENESS LEMMA (the order-free guarantee; pinned by the ScalaCheck
  * property in SimJoinLemmaSpec): for any pair (a, b) with
  * `J(a,b) ≥ 0.6`, the SMALLEST shared gram `g* = min(a ∩ b)` lies inside
  * BOTH prefixes. Proof: `ni = |a∩b| ≥ 0.6·nu ≥ 0.6·max(na,nb)`, so
  * `ni ≥ ⌈0.6·na⌉` (integrality). On side a, every gram ordered before
  * `g*` is non-shared, and there are at most `na − ni ≤ na − ⌈0.6·na⌉ =
  * plen_a − 1` of them — so `g*`'s 0-based position is `< plen_a`;
  * symmetrically for b. Hence BOTH documents carry `enroll = true` on
  * key `g*`, and within that single grouped key, whichever row Spark
  * processes second finds the first already enrolled — no appeal to any
  * global processing order across gram tasks is needed (there is none
  * within a micro-batch). Weaker arguments of the form "either side's
  * own-size prefix intersects the other's full set" are NOT sufficient
  * on their own: they admit an interleaving where each singly-prefixed
  * collision key probes before the other side enrolls. The double
  * enrollment on `g*` is what closes same-batch pairs. Verification is
  * an exact sorted two-pointer intersection on the stored signatures, so
  * a candidate collision never inflates a score.
  *
  * Scale posture: state is THE standing prefix inverted index, keyed by
  * gram hash and hash-partitioned across executors (RocksDB, off-heap) —
  * the same standing-index framing as [[StreamingNovelty]]'s (lang, gram)
  * seen-set, sharded by gram so no document or language is a hot key.
  * Residency is prefix-only (~40 % of the gram stream). Retention is the
  * operator's one genuine knob:
  *
  *  - `retention = None` (default): exact FOREVER — state grows
  *    O(corpus), ~`Σ plen·(16 + 8·n)` bytes ≈ measured by the soak row
  *    in BASELINE.md (§streaming soak: bytes/doc at the synthetic shape).
  *    The right mode for bounded backfills and batch-parity audits.
  *  - `retention = Some(d)`: every enrollment carries Spark's native
  *    state TTL (`TTLConfig(d)`) — the streaming analogue of
  *    [[TwoGenDeduper]]'s generation rotation, except eviction is
  *    per-value and sliding rather than two-phase. The contract narrows
  *    to: every pair whose members arrive within `d` of each other is
  *    emitted exactly; pairs straddling a wider gap are the declared
  *    job of the batch `h_simjoin_prefix` repair pass over the lake
  *    (same signatures, same threshold — the pair sets compose).
  *    This is the mode an unbounded ingest runs: state residency becomes
  *    O(arrival rate × d), flat forever.
  *
  * Re-delivered documents re-probe (duplicate hits collapse in the
  * consumer's (a_id, b_id) dedup, exactly like the batch DISTINCT) but
  * the residency check never enrolls a second copy — state is
  * replay-idempotent.
  */
object StreamingSimJoin {

  final case class GramKeyed(gram: Long, doc_id: Long, sig: Array[Long], enroll: Boolean)
  final case class StoredDoc(doc_id: Long, sig: Array[Long])
  final case class SimPair(a_id: Long, b_id: Long, jac_milli: Long)

  /** Exact sorted-array intersection size (both signatures ascend). */
  private def intersect(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0; var n = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  class Processor(retentionMs: Long = 0L)
      extends StatefulProcessor[Long, GramKeyed, SimPair] {

    @transient private var residents: ListState[StoredDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl =
        if (retentionMs > 0L) TTLConfig(java.time.Duration.ofMillis(retentionMs))
        else TTLConfig.NONE
      residents = getHandle.getListState[StoredDoc](
        "residents", Encoders.product[StoredDoc], ttl)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[GramKeyed], timerValues: TimerValues): Iterator[SimPair] = {
      val out = Vector.newBuilder[SimPair]
      rows.foreach { d =>
        val nd = d.sig.length.toLong
        val stored = residents.get()
        var alreadyResident = false
        while (stored.hasNext) {
          val r = stored.next()
          if (r.doc_id == d.doc_id) alreadyResident = true
          else {
            val nr = r.sig.length.toLong
            // J >= 0.6 implies the 3/5 length band; cheap skip, exactness
            // unaffected (the verify below is the decision)
            if (3 * nd <= 5 * nr && 3 * nr <= 5 * nd) {
              val ni = intersect(r.sig, d.sig)
              val nu = nr + nd - ni
              if (5 * ni >= 3 * nu) {
                val (a, b) = if (r.doc_id < d.doc_id) (r.doc_id, d.doc_id)
                             else (d.doc_id, r.doc_id)
                out += SimPair(a, b, 1000L * ni / nu)
              }
            }
          }
        }
        if (d.enroll && !alreadyResident)
          residents.appendValue(StoredDoc(d.doc_id, d.sig))
      }
      out.result().iterator
    }
  }

  /** Wire the exact join onto a stream of (doc_id LONG, text STRING).
    * Emits one [[SimPair]] per (shared-gram, resident) collision above
    * J ≥ 0.6 — the same pair may surface from several shared grams;
    * dedup on (a_id, b_id) downstream, as the batch DISTINCT does.
    *
    * `retentionMs = 0` keeps enrollments forever (exact, O(corpus)
    * state); `> 0` bounds residency to the sliding window via native
    * state TTL — see the retention contract in the class doc. */
  def apply(stream: DataFrame, retentionMs: Long = 0L): Dataset[SimPair] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 3)
      // the batch twin's 60-bit md5-prefix gram hash, then the FIXED
      // total order: ascending hash value (sort_array), prefix = the
      // n - ceil(0.6 n) + 1 smallest
      .withColumn("sig", expr(
        """array_sort(array_distinct(transform(sequence(1, size(t) - 2),
          |  i -> CAST(conv(substr(md5(concat(element_at(t, i), '|', element_at(t, i + 1), '|',
          |       element_at(t, i + 2))), 1, 15), 16, 10) AS BIGINT))))""".stripMargin))
      .withColumn("n", size(col("sig")).cast("long"))
      .withColumn("plen", expr("n - ((3 * n + 4) DIV 5) + 1"))
      .select(posexplode(col("sig")).as(Seq("pos", "gram")),
        col("doc_id"), col("sig"), col("plen"))
      .select(col("gram"), col("doc_id"), col("sig"),
        (col("pos") < col("plen")).as("enroll"))
      .as[GramKeyed]
      .groupByKey(_.gram)
      .transformWithState(new Processor(retentionMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
