package graft.operators

import org.apache.spark.sql.DataFrame

import scala.collection.mutable.ArrayBuffer

/** Lifecycle registry for `localCheckpoint()`ed DataFrames.
  *
  * Several query pipelines (MinHash shingle table, dup-cluster label
  * propagation) materialize intermediates via `localCheckpoint` so the
  * work runs once instead of once per downstream reference. A local
  * checkpoint pins storage-memory blocks for the JVM's lifetime unless
  * explicitly unpersisted — and a sequential 78-query bench session that
  * never releases them steadily starves execution memory (at cluster
  * scale, an OOM). But the *returned* DataFrame of a query often still
  * reads those blocks, so the query function itself cannot release them
  * before the caller's action runs.
  *
  * Contract: a query that checkpoints an intermediate its RESULT still
  * depends on wraps it in [[track]]; harnesses (Bench, Verify, specs)
  * call [[releaseAll]] after each query's action completes.
  * Intermediates the result does NOT depend on (superseded loop states,
  * edge tables consumed before the loop exits) are unpersisted inline at
  * the point they become dead instead of being tracked here.
  */
object Checkpoints {
  private val tracked = ArrayBuffer.empty[DataFrame]

  /** Register a checkpointed DataFrame for post-action release. */
  def track(df: DataFrame): DataFrame = synchronized { tracked += df; df }

  /** Unpersist every localCheckpoint BACKING an analyzed plan.
    *
    * `Dataset.unpersist` only consults the CacheManager, which never saw a
    * `localCheckpoint` — that path persists the internal RDD directly and
    * wraps it in a `LogicalRDD`. Releasing the blocks therefore means
    * walking the analyzed plan for LogicalRDD leaves (the frame may be a
    * projection/filter OVER the checkpoint, not the checkpoint itself)
    * and unpersisting their RDDs. Falls back to `Dataset.unpersist` for
    * plain `cache()`d frames.
    */
  def release(df: DataFrame): Unit = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    if (rdds.isEmpty) df.unpersist(blocking = false)
    else rdds.foreach(_.unpersist(blocking = false))
  }

  /** Unpersist every tracked checkpoint (idempotent, non-blocking). */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { df =>
      try release(df)
      catch { case _: Throwable => () } // a stopped session is not an error
    }
    tracked.clear()
  }
}
