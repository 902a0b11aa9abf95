package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.functions.GraftFunctions

/** STREAMING near-duplicate detection — the incremental form of the batch
  * `h_neardup_minhash` pipeline, for ingest-time curation where waiting
  * for a nightly batch pass would let duplicates into the training pool.
  *
  * Same LSH math as batch (word-3-gram shingles → 64-perm MinHash →
  * 16×4 banding), different execution: each document's 16 (band, hash)
  * bucket keys route through a hash-partitioned `transformWithState`
  * store holding the signatures previously seen in that bucket. An
  * arrival is compared against its bucket's residents by SIGNATURE
  * agreement (matching MinHash components / 64 — the unbiased Jaccard
  * estimator; the raw shingle sets are not retained, so state stays
  * signature-sized) and emits a hit per resident above the threshold.
  * The same pair can surface from up to 16 bands — downstream consumers
  * dedup on (a_id, b_id), exactly as the batch pipeline's DISTINCT does.
  *
  * Scale posture: state is keyed by bucket and hash-partitioned across
  * executors (RocksDB column families, off-heap); per-bucket residency is
  * capped at [[maxPerBucket]] (a bucket that hot means a degenerate band
  * — a real deployment widens the banding before raising the cap) and
  * expires after [[ttl]] of bucket inactivity, so state is bounded by
  * live-window volume, not stream lifetime.
  */
object StreamingNearDup {

  final case class BucketedDoc(bucket: Long, doc_id: Long, signature: Array[Long])
  final case class StoredSig(doc_id: Long, signature: Array[Long])
  /** `est_jaccard` = fraction of agreeing MinHash components (×1e4, as an
    * integer, so downstream grouping/dedup never touches float equality). */
  final case class NearDupHit(a_id: Long, b_id: Long, est_jaccard_x10k: Long, band: Int)

  class Processor(threshold: Double, maxPerBucket: Int, ttl: Duration)
      extends StatefulProcessor[Long, BucketedDoc, NearDupHit] {

    @transient private var residents: ListState[StoredSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      residents = getHandle.getListState[StoredSig](
        "residents", Encoders.product[StoredSig], TTLConfig(ttl))
    }

    override def handleInputRows(
        key: Long, rows: Iterator[BucketedDoc], timerValues: TimerValues): Iterator[NearDupHit] = {
      val band = (key >>> 32).toInt
      val out = Vector.newBuilder[NearDupHit]
      rows.foreach { doc =>
        val stored = residents.get()
        var n = 0
        var alreadyResident = false
        while (stored.hasNext) {
          val r = stored.next()
          n += 1
          if (r.doc_id == doc.doc_id) alreadyResident = true
          if (r.doc_id != doc.doc_id) {
            var agree = 0
            var i = 0
            val len = math.min(r.signature.length, doc.signature.length)
            while (i < len) {
              if (r.signature(i) == doc.signature(i)) agree += 1
              i += 1
            }
            val est = agree.toDouble / len
            if (est >= threshold) {
              val (a, b) = if (r.doc_id < doc.doc_id) (r.doc_id, doc.doc_id)
                           else (doc.doc_id, r.doc_id)
              out += NearDupHit(a, b, math.round(est * 10000), band)
            }
          }
        }
        // the residency check makes bucket state idempotent under
        // at-least-once redelivery: a replayed doc re-emits its hits (the
        // downstream (a_id, b_id) dedup absorbs them) but never enrolls a
        // second resident copy that would double every future comparison
        if (!alreadyResident && n < maxPerBucket)
          residents.appendValue(StoredSig(doc.doc_id, doc.signature))
      }
      out.result().iterator
    }
  }

  /** Wire the detector onto a stream of (doc_id LONG, text STRING).
    * Emits one [[NearDupHit]] per (bucket-collision, resident) above
    * `threshold`; dedup on (a_id, b_id) downstream. */
  def apply(stream: DataFrame, threshold: Double = 0.5,
            maxPerBucket: Int = 64,
            ttl: Duration = Duration.ofMinutes(10)): Dataset[NearDupHit] = {
    val spark = stream.sparkSession
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles", expr(
        """array_distinct(transform(sequence(1, size(tokens) - 2),
          |  i -> concat(element_at(tokens, i), '|', element_at(tokens, i + 1), '|',
          |              element_at(tokens, i + 2))))""".stripMargin))
      .withColumn("signature", expr("minhash_signature(transform(shingles, s -> fnv64a(s)), 64)"))
      .withColumn("band", explode(expr("sequence(0, 15)")))
      .withColumn("bucket", expr(
        "shiftleft(CAST(band AS BIGINT), 32) | (CAST(hash(slice(signature, band * 4 + 1, 4)) AS BIGINT) & 4294967295)"))
      .select(col("bucket"), col("doc_id"), col("signature"))
      .as[BucketedDoc]
      .groupByKey(_.bucket)
      .transformWithState(new Processor(threshold, maxPerBucket, ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
