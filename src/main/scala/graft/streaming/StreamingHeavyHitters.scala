package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.util.sketch.CountMinSketch

/** STREAMING count-min frequency sketch — the ingest-time form of the
  * batch `d_heavy_hitters` pass and the ELEVENTH batch/stream twin. It
  * completes the state-resident SKETCH family the way the batch side's
  * sketch family is complete: membership is [[StreamingBloomGate]],
  * distinct is `StreamingActiveUsers` (HLL), FREQUENCY is this. Per
  * key-space shard (`pmod(key, Shards)`) the state holds ONE serialized
  * Spark `CountMinSketch`; every micro-batch folds its keys in and
  * re-emits the shard's sketch bytes.
  *
  * BIT-COMPATIBILITY is the twin contract: the sketch is created with
  * EXACTLY the batch aggregate's parameters — `CountMinSketch.create(eps,
  * confidence, seed)`, the constructor SQL `count_min_sketch(key, eps,
  * confidence, seed)` uses — and updated with `addLong(key)`, which is
  * what `CountMinSketchAgg.update` does for an integral column. Counter
  * adds commute and `mergeInPlace` sums counter arrays, so the merged
  * shard sketches after ANY stream prefix are BYTE-EQUAL to one batch
  * `count_min_sketch` over the same rows, regardless of arrival order,
  * batching, sharding, or restarts (StreamingHeavyHittersSpec proves
  * byte equality across a mid-stream restart, and probes the emitted
  * bytes with the batch-side `CountMinSketch.estimateCount` directly).
  *
  * Redelivery contract: counter adds are NOT idempotent — a redelivered
  * row increments again, so under at-least-once replay every estimate
  * remains an UPPER BOUND on the true count (the same direction as the
  * CMS guarantee itself, `est ≥ exact`); byte-parity with batch holds
  * for exactly-once delivery, which is what the spec drives. This is
  * the declared trade against [[StreamingBloomGate]]'s fully
  * replay-idempotent bits — frequency needs counting, counting needs
  * delivery discipline.
  *
  * State per shard is the sketch's fixed `depth × width` counter array
  * FOREVER (~`d·w·8` bytes, independent of key volume or distinct
  * count) — the bounded-memory story shared with the Bloom gate, and
  * the reason a 100 TB frequency monitor ships sketches, not count
  * maps. Shards parallelize ingest (no key funnels through one task);
  * the report side merges `Shards` fixed-size sketches — a bounded,
  * associative reduce.
  */
object StreamingHeavyHitters {

  val Shards = 16
  /** The batch `d_heavy_hitters` constructor triple — both arms MUST
    * build with exactly these for bit-compatibility. */
  val Eps = 0.001
  val Confidence = 0.99
  val Seed = 42

  final case class KeyRow(shard: Long, key: Long)
  /** Latest per-shard emission: serialized sketch (readable by
    * `CountMinSketch.readFrom` and mergeable with the batch aggregate's
    * bytes), rows folded this batch, and the sketch's running total. */
  final case class ShardSketch(shard: Long, sketch: Array[Byte], n_batch: Long, total: Long)

  class Processor extends StatefulProcessor[Long, KeyRow, ShardSketch] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("cms", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[KeyRow],
        timerValues: TimerValues): Iterator[ShardSketch] = {
      if (!rows.hasNext) return Iterator.empty
      val cms =
        if (st.exists()) CountMinSketch.readFrom(new java.io.ByteArrayInputStream(st.get()))
        else CountMinSketch.create(Eps, Confidence, Seed)
      var n = 0L
      rows.foreach { r => cms.addLong(r.key); n += 1 }
      val bytes = cms.toByteArray
      st.update(bytes)
      Iterator.single(ShardSketch(key, bytes, n, cms.totalCount()))
    }
  }

  /** Wire the sketch onto a stream carrying a LONG `key` column. Emits
    * an updated [[ShardSketch]] per touched shard per micro-batch. */
  def apply(stream: DataFrame): Dataset[ShardSketch] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      .selectExpr(s"pmod(key, $Shards) AS shard", "key")
      .as[KeyRow]
      .groupByKey(_.shard)
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Merge the latest per-shard sketches into the corpus sketch —
    * `mergeInPlace` sums counter arrays, so this equals the single
    * batch aggregate byte-for-byte. */
  def merge(shardSketches: Seq[Array[Byte]]): CountMinSketch = {
    require(shardSketches.nonEmpty, "no shard sketches to merge")
    val it = shardSketches.iterator
    val acc = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(it.next()))
    it.foreach { b =>
      acc.mergeInPlace(CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
    }
    acc
  }
}
