package graft.operators

import graft.{SparkSpec, SparkSuite}

/** Pins the plan shapes the round-3 review flagged and round 4 fixed — a
  * regression here is a silent 5-10× slowdown at scale, invisible to the
  * row-level oracle. */
class PlanAuditSpec extends SparkSuite {

  test("d_agg_approx: no Expand (mixed distinct aggregates must not replicate the scan)") {
    val plan = FormatOps.dAggApprox(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"exact+approx count-distinct regressed to an Expand plan:\n$plan")
  }

  test("d_agg_approx: scan is pruned to the key column") {
    val plan = FormatOps.dAggApprox(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_partkey") && !readSchema.contains("l_quantity"),
      s"scan must read only l_partkey:\n$readSchema")
  }

  test("g_kpl_roundtrip: no whole-group materialization (collect_list) in the plan") {
    val df = PipelineQueries.gKplRoundtrip(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      s"packing regressed to whole-group collect_list (unbounded memory at scale):\n$plan")
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions"),
      s"expected the streaming per-partition fold:\n$plan")
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("h_lang_heuristic: text is tokenized once per row, not once per HOF") {
    val plan = LlmOps.hLangHeuristic(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).length
    assert(splits <= 1, s"split(text) appears $splits times — tokenize-once hoist regressed:\n$plan")
  }

  test("h_neardup_embedding: banded equi-join, and dimension filters push to the parquet scan") {
    val df = LlmOps.hNeardupEmbedding(spark, SparkSpec.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the candidate join must be a hash/merge equi-join on band keys
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
