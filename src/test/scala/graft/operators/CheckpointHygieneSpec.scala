package graft.operators

import graft.{SparkSpec, SparkSuite}

/** Storage-memory hygiene: the checkpoint-heavy pipelines must leave ZERO
  * persistent RDD blocks behind once the harness's post-action
  * [[Checkpoints.releaseAll]] runs. Without this, a sequential bench
  * session accumulates leaked localCheckpoint blocks (shingle table +
  * up-to-25 label-propagation rounds per invocation, twice per query) and
  * starves execution memory for every later query — at cluster scale, an
  * OOM rather than a slowdown.
  */
class CheckpointHygieneSpec extends SparkSuite {
  private def persistentCount: Int = spark.sparkContext.getPersistentRDDs.size

  private def afterRelease(body: => Unit): Int = {
    Checkpoints.releaseAll() // drop anything a previous suite left tracked
    Checkpoints.releaseShared() // including cross-query shared index tables
    val before = persistentCount
    try body
    finally { Checkpoints.releaseAll(); Checkpoints.releaseShared() }
    persistentCount - before
  }

  test("h_neardup_minhash leaves no persistent blocks after releaseAll") {
    val leaked = afterRelease {
      LlmOps.hNeardupMinhash(spark, SparkSpec.sf0001)
        .write.format("noop").mode("overwrite").save()
    }
    assert(leaked == 0, s"$leaked persistent RDDs leaked")
  }

  test("h_dup_clusters leaves no persistent blocks after releaseAll") {
    val leaked = afterRelease {
      TrainingOps.hDupClusters(spark, SparkSpec.sf0001)
        .write.format("noop").mode("overwrite").save()
    }
    assert(leaked == 0, s"$leaked persistent RDDs leaked")
  }

  test("h_dedup_survivors leaves no persistent blocks after releaseAll") {
    val leaked = afterRelease {
      TrainingOps.hDedupSurvivors(spark, SparkSpec.sf0001)
        .write.format("noop").mode("overwrite").save()
    }
    assert(leaked == 0, s"$leaked persistent RDDs leaked")
  }

  test("h_ivfpq_codes / h_ivfpq_search leave no persistent blocks after releaseAll") {
    // round 9: both checkpoint the 16-row centroid table; search also
    // checkpoints the 8-row codebook
    val leaked = afterRelease {
      LlmOps.hIvfPqCodes(spark, SparkSpec.sf0001)
        .write.format("noop").mode("overwrite").save()
      Checkpoints.releaseAll()
      LlmOps.hIvfPqSearch(spark, SparkSpec.sf0001)
        .write.format("noop").mode("overwrite").save()
    }
    assert(leaked == 0, s"$leaked persistent RDDs leaked")
  }

  test("h_curation_funnel leaves no persistent blocks after releaseAll") {
    // round 9: the one-pass funnel checkpoints the contaminated-id set and
    // the per-lang weights on top of the label-propagation chain
    val leaked = afterRelease {
      TrainingOps.hCurationFunnel(spark, SparkSpec.sf0001)
        .write.format("noop").mode("overwrite").save()
    }
    assert(leaked == 0, s"$leaked persistent RDDs leaked")
  }

  test("h_supplier_rank leaves no persistent blocks after releaseAll") {
    // round 10: the rank loop checkpoints the undirected edge list once
    val leaked = afterRelease {
      AnalyticsOps.hSupplierRank(spark, SparkSpec.sf0001)
        .write.format("noop").mode("overwrite").save()
    }
    assert(leaked == 0, s"$leaked persistent RDDs leaked")
  }

  test("component labels are built once and shared across their three consumers") {
    Checkpoints.releaseAll()
    Checkpoints.releaseShared()
    val base = persistentCount
    // first consumer builds the shared label table (plus its own tracked
    // checkpoints, released post-action)
    TrainingOps.hDupClusters(spark, SparkSpec.sf0001)
      .write.format("noop").mode("overwrite").save()
    Checkpoints.releaseAll()
    val afterFirst = persistentCount
    assert(afterFirst >= base + 1, "shared label table should survive releaseAll")
    // the other two consumers must REUSE it: no new persistent blocks
    // survive their releaseAll
    TrainingOps.hDedupSurvivors(spark, SparkSpec.sf0001)
      .write.format("noop").mode("overwrite").save()
    Checkpoints.releaseAll()
    TrainingOps.hCurationFunnel(spark, SparkSpec.sf0001)
      .write.format("noop").mode("overwrite").save()
    Checkpoints.releaseAll()
    assert(persistentCount == afterFirst,
      s"consumers rebuilt the shared table: $afterFirst -> $persistentCount blocks")
    Checkpoints.releaseShared()
    assert(persistentCount == base,
      s"releaseShared left ${persistentCount - base} blocks")
  }

  test("superseded label rounds release inside the loop, not only at the end") {
    Checkpoints.releaseAll()
    Checkpoints.releaseShared()
    // while hDupClusters runs, the resident snapshot count must stay
    // bounded (shingle table + edges + ≤2 label rounds + result-backing
    // labels), regardless of how many propagation rounds converge takes
    TrainingOps.hDupClusters(spark, SparkSpec.sf0001)
      .write.format("noop").mode("overwrite").save()
    // post-action but pre-release: only the tracked survivors remain
    assert(persistentCount <= 4,
      s"$persistentCount persistent RDDs resident post-action (expected ≤4: shingle table + final labels)")
    Checkpoints.releaseAll()
  }
}
