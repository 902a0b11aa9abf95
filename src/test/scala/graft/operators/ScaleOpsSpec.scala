package graft.operators

import graft.{SparkSpec, SparkSuite}

class ScaleOpsSpec extends SparkSuite {

  test("bucketed join plan has no Exchange feeding the join (co-located buckets)") {
    // at tiny SF the optimizer broadcasts instead (also shuffle-free);
    // disable broadcast to expose the bucket co-location property itself
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = ScaleOps.cJoinBucketed(spark, SparkSpec.sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // in tree text the join's children print BELOW it: no shuffle may
      // appear after the join line (exchanges above belong to agg/sort)
      val joinSubtree = plan.linesIterator.dropWhile(l => !l.contains("Join"))
        .drop(1).mkString("\n")
      assert(!joinSubtree.contains("Exchange"),
        s"join subtree must read buckets without a shuffle:\n$plan")
      assert(df.collect().map(_.getLong(1)).sum > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // manual salting (c_join_salted) is the static answer to skew; this
    // pins the DYNAMIC one — AQE's OptimizeSkewedJoin must actually engage
    // on a 99 %-one-key join when the runtime stats cross the thresholds
    // (thresholds lowered to fire at test scale; restored after)
    import org.apache.spark.sql.functions._
    val tuned = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val skewed = spark.range(0, 200000)
        .select(when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 200000, 100).select(col("id").as("k"), lit(1).as("w"))
      val df = skewed.join(dim, "k").agg(sum(col("v")).as("s"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not engage on a 99%-one-key join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces overprovisioned shuffle partitions at runtime") {
    // the flip side of skew-splitting: a cluster-sized
    // spark.sql.shuffle.partitions (thousands on a real deployment) must
    // not mean thousands of tiny reducers for a small intermediate — AQE's
    // CoalesceShufflePartitions folds them to the advisory size from
    // runtime stats. Pin that it engages: the final plan reads the shuffle
    // through AQEShuffleRead(coalesced) with far fewer partitions than
    // requested.
    import org.apache.spark.sql.functions._
    val tuned = Map(
      "spark.sql.shuffle.partitions" -> "512",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = spark.range(0, 100000)
        .select((col("id") % 97).as("k"), col("id").as("v"))
        .groupBy(col("k")).agg(sum(col("v")).as("s"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"AQE did not coalesce the 512-partition shuffle:\n$plan")
      val parts = df.rdd.getNumPartitions
      assert(parts < 64, s"expected the 512 requested partitions folded to a few, got $parts")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE converts a planned shuffle join to broadcast from runtime stats") {
    // third member of the runtime-re-plan trio (skew split, partition
    // coalesce, and THIS — DynamicJoinSelection/replanning): the static
    // planner, denied size stats (autoBroadcastJoinThreshold=-1), plans a
    // SortMergeJoin; after the build side materializes and turns out tiny,
    // AQE must re-plan the join as a BroadcastHashJoin. On a 1000-executor
    // cluster this is what rescues every join whose dim-side ESTIMATE was
    // inflated (post-filter cardinality, fresh tables with no stats).
    import org.apache.spark.sql.functions._
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.range(0, 200000).select((col("id") % 1000).as("k"), col("id").as("v"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val df = fact.join(dim, "k").agg(sum(col("v") + col("w")).as("s"))
      val staticPlan = df.queryExecution.executedPlan.toString
      assert(staticPlan.contains("SortMergeJoin"),
        s"precondition: the static plan must start as a shuffle join:\n$staticPlan")
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"AQE did not promote the tiny build side to broadcast:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted join equals the plain join result") {
    import org.apache.spark.sql.functions._
    val plain = graft.Tables.load(spark, SparkSpec.sf0001, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_extendedprice"))
      .join(graft.Tables.load(spark, SparkSpec.sf0001, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus")), "k")
      .groupBy(col("o_orderstatus")).count().orderBy(col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = ScaleOps.cJoinSalted(spark, SparkSpec.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted === plain)
  }

  test("a_skew_profile's salt recommendation is actionable, not just printed") {
    import org.apache.spark.sql.functions._
    // the derived factor must equal the profile's salt_factor column for
    // BOTH profiled keys — the bridge runs the same integer arithmetic
    val profile = ScaleOps.aSkewProfile(spark, SparkSpec.sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val docs = graft.Tables.load(spark, SparkSpec.sf0001, "documents")
    val events = graft.Tables.load(spark, SparkSpec.sf0001, "events")
    val langSalt = ScaleOps.recommendedSalt(docs, "lang")
    assert(langSalt.toLong === profile("documents.lang"),
      "derived lang salt must match the profile row")
    assert(ScaleOps.recommendedSalt(events, "user_id").toLong
      === profile("events.user_id"),
      "derived user_id salt must match the profile row")
    // Zipfian langs over 32 target partitions need real spreading
    assert(langSalt > 1, "the hot-key profile must actually recommend salting")
    // actionability: a join on the hot key salted by the DERIVED factor is
    // semantics-preserving (same contract cJoinSalted proves for its
    // hardcoded 8)
    val dim = docs.groupBy(col("lang")).count()
      .select(col("lang").as("k"), col("count").as("lang_n"))
    val fact = docs.select(col("lang").as("k"), col("n_chars"))
    def summarize(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
      df.groupBy(col("k")).agg(sum(col("n_chars")).as("chars"), max(col("lang_n")).as("n"))
        .orderBy(col("k"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val plainJoin = summarize(fact.join(dim, "k"))
    // the salted frame keeps both sides' k/_salt columns — rename
    // positionally to deduplicate before the summary
    val saltedJoin = summarize(
      ScaleOps.saltedJoin(fact, dim, "k", langSalt)
        .toDF("k", "n_chars", "s1", "k2", "lang_n", "s2")
        .select(col("k"), col("n_chars"), col("lang_n")))
    assert(saltedJoin === plainJoin)
  }
}
