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

  /** Unpersist a localCheckpoint'ed DataFrame's BACKING RDD.
    *
    * `Dataset.unpersist` only consults the CacheManager, which never saw a
    * `localCheckpoint` — that path persists the internal RDD directly and
    * wraps it in a `LogicalRDD`. Releasing the blocks therefore means
    * reaching through the analyzed plan to that RDD. Falls back to
    * `Dataset.unpersist` for plain `cache()`d frames.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist(blocking = false)
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
