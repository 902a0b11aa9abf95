package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING stratified sampling — the ingest-time form of the batch
  * `h_stratified_sample` eval-holdout constructor. A standing exactly-k
  * sample per (lang, source) stratum is maintained while documents arrive;
  * at every point in the stream, the state holds the k documents with the
  * SMALLEST deterministic content-hash draw (md5-prefix, doc_id
  * tie-break) among everything seen so far.
  *
  * That invariant is the whole design: "k smallest by a uniform hash" is a
  * bottom-k sketch — order-insensitive, duplicate-stable, and mergeable —
  * so the streaming state converges to EXACTLY the batch query's sample
  * on the same rows, regardless of arrival order or batch boundaries
  * (StreamingStratifiedSamplerSpec proves prefix-equality against
  * `TrainingOps.hStratifiedSample`). A restarted or re-sharded stream
  * re-derives the same sample; two shards' samples union-and-truncate to
  * the global one (the classic distributed-bottom-k merge).
  *
  * Guarantee split under at-least-once delivery: the SAMPLE itself is
  * redelivery-stable (the merge dedups on (draw, doc_id), so a replayed
  * row cannot double-fill a slot), but the `n_stratum` population counter
  * is a plain row count and counts each delivery — under source replay it
  * is an UPPER BOUND on the distinct population, exact only under
  * exactly-once delivery (Kafka/file sources with checkpointing, and the
  * spec's MemoryStream). An exact duplicate-proof count would need
  * per-id state (no longer O(k)); pipelines that need a distinct count
  * under replay should pair the sampler with a per-stratum
  * approx_count_distinct aggregate instead.
  *
  * Scale posture: state is k entries + one counter per stratum,
  * hash-partitioned across executors by stratum key; per-row work is an
  * O(k) in-memory merge. Emission is OutputMode.Update — one summary row
  * per stratum per micro-batch in which that stratum changed — so
  * downstream sees the freshest sample without replaying the stream.
  */
object StreamingStratifiedSampler {

  final case class DocRow(
      doc_id: Long, lang: String, source: String, n_chars: Long, draw: Long)
  final case class SampleEntry(draw: Long, doc_id: Long, n_chars: Long)

  /** The bottom-k merge: k smallest entries by (draw, doc_id) from the
    * union of two samples. This single function carries the sketch's
    * algebra — it is commutative, associative, and idempotent with
    * `mergeBottomK(s, Vector.empty, k) = s` for any k-bounded s, so any
    * arrival order, batching, re-sharding, or replay converges to the
    * same sample (property-tested in StreamingStratifiedSamplerSpec). */
  def mergeBottomK(
      a: Vector[SampleEntry], b: Vector[SampleEntry], k: Int): Vector[SampleEntry] =
    (a ++ b).distinct.sortBy(e => (e.draw, e.doc_id)).take(k)
  /** Matches the batch query's per-stratum report columns. */
  final case class StratumSample(
      lang: String, source: String, n_stratum: Long, n_sampled: Long,
      sampled_id_sum: Long, sampled_chars: Long)

  class Processor(k: Int)
      extends StatefulProcessor[(String, String), DocRow, StratumSample] {

    @transient private var sample: ListState[SampleEntry] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sample = getHandle.getListState[SampleEntry](
        "sample", Encoders.product[SampleEntry], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: (String, String), rows: Iterator[DocRow],
        timerValues: TimerValues): Iterator[StratumSample] = {
      val incoming = rows.toVector
      if (incoming.isEmpty) return Iterator.empty
      val current = {
        val it = sample.get()
        val b = Vector.newBuilder[SampleEntry]
        while (it.hasNext) b += it.next()
        b.result()
      }
      // bottom-k merge on (draw, doc_id) — identical to the batch
      // row_number() ORDER BY draw, doc_id ranking; dedup makes the merge
      // idempotent, so at-least-once redelivery cannot double-fill a slot.
      // `seen` deliberately counts deliveries, not distinct ids (see the
      // object Scaladoc's guarantee split): exact under exactly-once,
      // an upper bound under replay.
      val merged = mergeBottomK(
        current, incoming.map(d => SampleEntry(d.draw, d.doc_id, d.n_chars)), k)
      val n = (if (seen.exists()) seen.get() else 0L) + incoming.size
      seen.update(n)
      if (merged != current) {
        sample.clear()
        sample.appendList(merged.toArray)
      }
      Iterator.single(StratumSample(
        key._1, key._2, n, merged.size,
        merged.iterator.map(_.doc_id).sum, merged.iterator.map(_.n_chars).sum))
    }
  }

  /** Wire the sampler onto a stream of documents
    * (doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG).
    * Emits an updated [[StratumSample]] per touched stratum per batch. */
  def apply(stream: DataFrame, k: Int = 10): Dataset[StratumSample] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      // the draw is computed scan-local with the EXACT batch expression —
      // prefix-equality with h_stratified_sample depends on it
      .withColumn("draw",
        expr("CAST(conv(substring(md5(text), 1, 6), 16, 10) AS BIGINT)"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("draw"))
      .as[DocRow]
      .groupByKey(d => (d.lang, d.source))
      .transformWithState(new Processor(k), TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
