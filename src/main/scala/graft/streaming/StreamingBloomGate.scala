package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.GraftFunctions

/** STREAMING Bloom seen-before gate — the ingest-time form of the batch
  * `h_dedup_bloom_sharded` pass, and the EIGHTH batch/stream twin. Per
  * key-space shard (`pmod(fnv64a(text), Shards)`, the batch query's
  * sharding rule) the state holds ONE serialized Spark
  * `BloomFilter`; every micro-batch probes its rows against the
  * pre-batch filter, inserts them, and re-emits the shard's filter
  * bytes with probe accounting.
  *
  * BIT-COMPATIBILITY is the twin contract: the filter is created with
  * the same (expectedItems, numBits) the batch aggregate uses and
  * updated with `putLong(xxhash64(key))` — exactly what
  * `BloomFilterAggregate` puts — and Bloom bits are a set union, so
  * the state after ANY stream prefix is BYTE-EQUAL to
  * `BloomCols.bloomFilterAgg` over the same keys, regardless of
  * arrival order, batching, or restarts (StreamingBloomGateSpec proves
  * byte equality, and the emitted bytes probe with the batch-side
  * `might_contain` directly).
  *
  * Redelivery contract: the FILTER is exact under at-least-once replay
  * (inserting a present key changes no bit — same argument as the HLL
  * twin's registers); `n_seen`/`n_probed` count deliveries, so a
  * replayed batch inflates them (upper bound) while flagging every
  * replayed row as seen — which is the CORRECT gate answer for a
  * redelivered document. `n_seen` counts rows whose key was in the
  * filter BEFORE the current batch (probe-then-insert at batch
  * granularity), so it is batch-content-deterministic, not
  * row-order-dependent.
  *
  * State per shard is numBits/8 bytes FOREVER, independent of key
  * volume — the bounded-memory trade against [[TwoGenDeduper]]'s exact
  * windowed set, and the reason a 10⁹-key ingest gate is a Bloom shard
  * table, not a hash set. */
object StreamingBloomGate {

  val Shards = 16
  /** Per-shard design capacity; ~9.585 bits/key at the batch pass's 1 %
    * design fpp. Both arms must build with EXACTLY these two numbers for
    * bit-compatibility. */
  val ExpectedKeysPerShard = 65536L
  val NumBits = 628294L

  final case class KeyRow(shard: Long, h: Long)
  /** Latest per-shard emission: serialized filter (readable by
    * `BloomFilter.readFrom` and the batch `might_contain`), rows probed
    * this batch, and how many of them were already present. */
  final case class ShardFilter(shard: Long, filter: Array[Byte], n_probed: Long, n_seen: Long)

  class Processor extends StatefulProcessor[Long, KeyRow, ShardFilter] {

    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("bf", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[KeyRow],
        timerValues: TimerValues): Iterator[ShardFilter] = {
      if (!rows.hasNext) return Iterator.empty
      val filter =
        if (st.exists()) BloomFilter.readFrom(new java.io.ByteArrayInputStream(st.get()))
        else BloomFilter.create(ExpectedKeysPerShard, NumBits)
      val batch = rows.toArray
      // probe against the PRE-batch filter so n_seen is batch-content-
      // deterministic (a within-batch duplicate counts once as new)
      val seen = batch.count(r => filter.mightContainLong(r.h))
      batch.foreach(r => filter.putLong(r.h))
      val out = new java.io.ByteArrayOutputStream()
      filter.writeTo(out)
      val bytes = out.toByteArray
      st.update(bytes)
      Iterator.single(ShardFilter(key, bytes, batch.length.toLong, seen.toLong))
    }
  }

  /** Wire the gate onto a stream of documents (doc_id LONG, text STRING).
    * Emits an updated [[ShardFilter]] per touched shard per micro-batch. */
  def apply(stream: DataFrame): Dataset[ShardFilter] = {
    val spark = stream.sparkSession
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      .selectExpr(
        s"pmod(fnv64a(text), $Shards) AS shard",
        "xxhash64(fnv64a(text)) AS h") // the exact value BloomFilterAggregate puts
      .as[KeyRow]
      .groupByKey(_.shard)
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
