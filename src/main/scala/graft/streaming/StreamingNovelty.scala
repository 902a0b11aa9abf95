package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING n-gram novelty — the ingest-time form of the batch
  * `h_novelty_incremental` audit. The batch operator joins a daily batch's
  * distinct word-8-grams against a checkpointed standing (lang, gram)
  * index; here the standing index LIVES IN the state store and every
  * arriving gram classifies itself on contact: one verdict row per
  * distinct (lang, gram) per micro-batch, `novel = the store had never
  * seen it`, after which the gram is marked seen.
  *
  * Keying is the scale decision: state is keyed by (lang, gram) — NOT by
  * lang — so the standing index shards across executors by gram hash
  * exactly like the batch operator's equi-join keys, no language is a hot
  * key, and per-batch work scales with the batch's distinct-gram volume
  * (the `handleInputRows` group for a key is that key's in-batch
  * occurrences, so within-batch DISTINCT falls out of the grouping).
  * State per key is one boolean — the RocksDB store holds the gram
  * vocabulary, the same asymptotic footprint as the batch operator's
  * checkpointed index table.
  *
  * Micro-batch-split invariance (StreamingNoveltySpec proves it against
  * `TrainingOps.hNoveltyIncremental`): a gram occurring in several
  * micro-batches of one ingest wave emits `novel=true` at most once (its
  * first contact), every later emission is false — so aggregating a
  * wave's verdicts as `max(novel)` per gram yields the batch answer no
  * matter where the trigger cut the wave. Novelty is exact under
  * exactly-once delivery; under at-least-once REPLAY, a replayed gram has
  * already marked itself seen, so replays deflate the novelty rate (the
  * same delivery-semantics caveat as [[StreamingStratifiedSampler]]'s
  * n_stratum counter — the sample/flag state itself stays correct).
  *
  * The gram expressions are the EXACT batch expressions (split on ' ',
  * 8-token windows concat_ws'd with '|', docs under 8 tokens skipped) —
  * batch equivalence depends on both.
  */
object StreamingNovelty {

  final case class GramEvent(lang: String, gram: String)
  final case class GramVerdict(lang: String, gram: String, novel: Boolean)

  class Processor extends StatefulProcessor[(String, String), GramEvent, GramVerdict] {

    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String), rows: Iterator[GramEvent],
        timerValues: TimerValues): Iterator[GramVerdict] = {
      if (!rows.hasNext) return Iterator.empty
      val novel = !seen.exists()
      if (novel) seen.update(true)
      Iterator.single(GramVerdict(key._1, key._2, novel))
    }
  }

  /** Wire the novelty classifier onto a stream of documents
    * (doc_id LONG, text STRING, lang STRING). Emits one [[GramVerdict]]
    * per distinct (lang, gram) per micro-batch. */
  def apply(stream: DataFrame): Dataset[GramVerdict] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      .selectExpr("lang", "split(text, ' ') AS t")
      .where(expr("size(t) >= 8"))
      .select(col("lang"), col("t"),
        explode(expr("sequence(1, size(t) - 7)")).as("i"))
      .selectExpr("lang",
        """concat_ws('|', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2),
          |  element_at(t, i + 3), element_at(t, i + 4), element_at(t, i + 5),
          |  element_at(t, i + 6), element_at(t, i + 7)) AS gram""".stripMargin)
      .as[GramEvent]
      .groupByKey(e => (e.lang, e.gram))
      .transformWithState(new Processor, TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Roll one ingest wave's verdicts up to the batch operator's report
    * columns (micro-batch-split invariant: `max(novel)` per gram, see
    * object Scaladoc). `indexSizes` is the standing per-lang gram count
    * before the wave (the batch operator's n_index_grams). */
  def report(verdicts: DataFrame, indexSizes: Map[String, Long]): DataFrame = {
    val spark = verdicts.sparkSession
    val sizes = spark.createDataFrame(indexSizes.toSeq.map(kv => (kv._1, kv._2)))
      .toDF("lang", "n_index_grams")
    verdicts
      .groupBy("lang", "gram")
      .agg(max(col("novel")).as("novel"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_batch_grams"),
        sum(when(col("novel"), 1L).otherwise(0L)).as("n_novel"))
      .join(sizes, Seq("lang"))
      .selectExpr("lang", "n_index_grams", "n_batch_grams", "n_novel",
        "n_index_grams + n_novel AS n_index_after",
        "CAST(n_novel * 1000 DIV n_batch_grams AS BIGINT) AS novelty_millis")
  }
}
