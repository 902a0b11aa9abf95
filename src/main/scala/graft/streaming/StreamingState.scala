package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared state-store wiring for the streaming twins. */
object StreamingState {

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** `transformWithState` requires the RocksDB state-store provider (the
    * default HDFS-backed store cannot host its column families) — and
    * Spark exposes the provider ONLY as session-level SQLConf; there is no
    * per-query override on `DataStreamWriter`. Wiring any streaming twin
    * therefore sets `spark.sql.streaming.stateStore.providerClass` for the
    * WHOLE session: a streaming query started later on the same session
    * inherits RocksDB even if it never asked for it. That is deliberate
    * and centralized here so the side effect is documented once; callers
    * that need a different provider for other queries must run those on a
    * separate `SparkSession` (e.g. `spark.newSession()`). The set is
    * skipped when the session already runs RocksDB. */
  def requireRocksDB(spark: SparkSession): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    if (!spark.conf.getOption(key).contains(RocksDBProvider))
      spark.conf.set(key, RocksDBProvider)
  }
}
