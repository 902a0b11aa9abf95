package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming → lake MERGE bridge: a `foreachBatch` sink that upserts each
  * micro-batch into a parquet-backed corpus with snapshot atomicity and
  * batch-id idempotence — the exactly-once path from the ingest stream to
  * the standing corpus the curation queries read.
  *
  * Mechanics (the poor-man's table format, the same commit discipline
  * Delta/Iceberg implement with a log):
  *  - each applied batch writes a COMPLETE new snapshot directory
  *    `v<batchId>/` (merge = ONE doc_id-keyed full outer join against the
  *    current snapshot — the [[graft.operators.AnalyticsOps.hCorpusMerge]]
  *    machinery, delete-wins);
  *  - a single `_latest` pointer file names the live snapshot; readers
  *    resolve the pointer then read only that directory, so a reader never
  *    observes a half-written snapshot (the write is invisible until the
  *    pointer moves);
  *  - the pointer carries the last applied batchId: a REPLAYED batch
  *    (foreachBatch re-delivery after failure/restart is at-least-once)
  *    compares ids and SKIPS — upsert becomes exactly-once;
  *  - the pointer move is a same-directory atomic file move.
  *
  * Scale posture: the merge join is doc_id-keyed (zero-shuffle under a
  * bucketed lake layout, the h_corpus_diff argument); full-snapshot
  * rewrite is the simplification — a production variant partitions the
  * corpus and rewrites only partitions the batch touches, but the commit
  * protocol (snapshot + pointer + batch ledger) is exactly this one.
  *
  * Batch schema: (doc_id LONG, text STRING, op STRING[, op_seq LONG])
  * with op ∈ {"upsert", "delete"}; the row with the greatest op_seq wins
  * per doc_id, deletes tombstone. Producers with multi-partition batches
  * MUST supply op_seq — the derived fallback is partition-major, not
  * arrival order.
  */
object LakeMerge {

  private def pointerPath(dir: String) = Paths.get(dir, "_latest")

  /** The live snapshot's (batchId, path), if any batch has committed. */
  def latest(dir: String): Option[(Long, String)] = {
    val p = pointerPath(dir)
    if (!Files.exists(p)) None
    else {
      val id = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
      Some((id, Paths.get(dir, s"v$id").toString))
    }
  }

  /** Read the live corpus (empty (doc_id, text) frame when nothing
    * committed — the post-merge schema, which never carries `op`). */
  def readCorpus(s: SparkSession, dir: String): DataFrame =
    latest(dir) match {
      case Some((_, path)) => s.read.parquet(path)
      case None =>
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    }

  /** The foreachBatch body. Apply batch `batchId` to the corpus at `dir`. */
  def mergeBatch(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    Files.createDirectories(Paths.get(dir))
    val applied = latest(dir).map(_._1)
    if (applied.exists(_ >= batchId)) return // replayed batch: exactly-once skip
    // resolve within-batch conflicts deterministically: last op per doc
    // wins. Ordering: an explicit `op_seq` column when the producer
    // supplies one (the only well-defined cross-partition order), else
    // monotonically_increasing_id — which is PARTITION-MAJOR (partition
    // index, then position), a documented approximation for multi-
    // partition batches without a producer sequence.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("op_seq").desc)
    val seqd =
      if (batch.columns.contains("op_seq")) batch
      else batch.withColumn("op_seq", monotonically_increasing_id())
    val delta = seqd
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text"), col("op"))
    val current = readCorpus(s, dir)
      .select(col("doc_id").as("c_id"), col("text").as("c_text"))
    // ONE doc_id-keyed full outer join; delete-wins
    val merged = current.join(delta, col("c_id") === delta("doc_id"), "full")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
      .select(
        coalesce(col("doc_id"), col("c_id")).as("doc_id"),
        when(col("op") === "upsert", col("text")).otherwise(col("c_text")).as("text"))
    val snap = Paths.get(dir, s"v$batchId").toString
    merged.write.mode("overwrite").parquet(snap)
    // commit: write pointer beside the target, then move atomically
    val tmp = Paths.get(dir, s"_latest.tmp$batchId")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
