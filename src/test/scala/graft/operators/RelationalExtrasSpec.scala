package graft.operators

import graft.{SparkSpec, SparkSuite}

/** Semantic + plan invariants for the round-10 relational additions:
  * TPC-H Q5 shape, recursive CTE closure, lateral top-n, bigram LM. */
class RelationalExtrasSpec extends SparkSuite {

  private val sf = SparkSpec.sf0001

  test("q5_local_supplier: revenue positive, descending, and the date filter reaches the orders scan") {
    val df = RelationalQueries.q5LocalSupplier(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5, "at most one row per ASIA nation")
    val revs = rows.map(_.getDouble(1))
    assert(revs.forall(_ > 0))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "revenue ordering broken")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"orders date filter did not push to the parquet scan:\n$plan")
  }

  test("d_recursive_cte: closure covers every part exactly once, roots only at depth 0") {
    val rows = RelationalQueries.dRecursiveCte(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val parts = spark.read.parquet(s"$sf/part.parquet").count()
    assert(total == parts, s"closure visited $total of $parts parts")
    val depth0 = rows.find(_.getLong(0) == 0L).get
    assert(depth0.getLong(1) == 8L, "depth 0 must be exactly the 8 anchor keys")
    assert(depth0.getLong(3) == 8L, "each anchor is its own root")
    // key conservation: per-depth checksums sum to the full key range sum
    val keySum = rows.map(_.getLong(2)).sum
    assert(keySum == (parts - 1) * parts / 2, "key checksum not conserved")
  }

  test("d_lateral_topn: <=3 rows per nation, balances descend within each, and the plan is decorrelated") {
    val df = RelationalQueries.dLateralTopn(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (n, rs) =>
      assert(rs.length <= 3, s"$n returned ${rs.length} rows")
      val bals = rs.map(_.getDouble(2))
      assert(bals.zip(bals.tail).forall { case (a, b) => a >= b }, s"$n balance order broken")
    }
    // Catalyst must rewrite the correlated LIMIT into one partitioned
    // window — a nested-loop per-nation rescan is the scale killer
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("row_number"), s"lateral top-n not decorrelated to a window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("f2_variant: one schema for every row, nested array extraction doubles the flat path") {
    val rows = RelationalQueries.f2Variant(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(4) == "OBJECT<k: BIGINT>", s"variant schema drifted: ${r.getString(4)}")
      assert(r.getLong(3) == 2 * r.getLong(2), "arr[1] extraction must equal 2k")
    }
    val n = rows.map(_.getLong(1)).sum
    assert(n == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("h_taxonomy_classify: topics stay in the taxonomy, each doc labels at most once") {
    val rows = LlmOps.hTaxonomyClassify(spark, sf).collect()
    assert(rows.nonEmpty)
    val topics = rows.map(_.getString(1)).toSet
    assert(topics.subsetOf(Set("storage", "exec", "streaming", "perf")), topics.toString)
    val labeled = rows.map(_.getLong(2)).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(labeled <= docs, s"labeled $labeled of $docs docs — a doc got two labels")
    assert(labeled > 0)
  }

  test("h_contam_embedding: every planted paraphrase is flagged, totals reconcile") {
    val rows = LlmOps.hContamEmbedding(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val benchN = emb.where("vec_id % 17 = 0").count()
    val trainN = emb.where("vec_id % 17 <> 0").count() + benchN // planted copies
    assert(rows.map(_.getLong(1)).sum == trainN, "train side count drifted")
    // each planted copy sits at cosine ~0.9998 to its original: must be flagged
    assert(rows.map(_.getLong(2)).sum >= benchN,
      s"flagged ${rows.map(_.getLong(2)).sum} < planted $benchN — LSH lost a planted pair")
    rows.foreach(r => assert(r.getLong(2) + r.getLong(3) == r.getLong(1)))
  }

  test("c_join_hints: each strategy hint binds its operator, all three agree") {
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("orders")
    spark.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("customer")
    def q(hint: String) = spark.sql(
      s"""SELECT /*+ $hint(c) */ c.c_mktsegment, count(*) AS n
         |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
    val expect = Map(
      "SHUFFLE_HASH" -> "ShuffledHashJoin",
      "MERGE" -> "SortMergeJoin",
      "BROADCAST" -> "BroadcastHashJoin")
    val results = expect.map { case (hint, op) =>
      val df = q(hint)
      // AQE may re-plan; the INITIAL plan must honor the user's hint
      val plan = df.queryExecution.sparkPlan.toString
      assert(plan.contains(op), s"$hint hint did not produce $op:\n$plan")
      hint -> df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(results.values.toSet.size == 1, "hint variants disagree on the result")
  }

  test("f_limit_offset: page 3 continues exactly where page-by-keyset would") {
    val page = RelationalQueries.fLimitOffset(spark, sf).collect()
    assert(page.length == 20)
    // recompute rows 41-60 from a full sort — the page must equal the slice
    val full = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment", "CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal")
      .orderBy(org.apache.spark.sql.functions.col("c_acctbal").desc,
        org.apache.spark.sql.functions.col("c_custkey"))
      .limit(60).collect().drop(40)
    assert(page.map(_.getLong(0)).sameElements(full.map(_.getLong(0))),
      "OFFSET page drifted from the sorted slice")
  }

  test("d_heavy_hitters: the CMS contract holds for every probed key") {
    val rows = FormatOps.dHeavyHitters(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getBoolean(2)), "a CMS estimate fell outside [exact, exact + eps*N]")
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "top-10 ordering broken")
  }

  test("h_supplier_rank: ranks positive and descending, keys are real suppliers") {
    val rows = AnalyticsOps.hSupplierRank(spark, sf).collect()
    val supps = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(rows.length == math.min(15, supps.size))
    val ranks = rows.map(_.getLong(1))
    assert(ranks.forall(_ > 0))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b }, "rank ordering broken")
    assert(rows.map(_.getLong(0)).forall(supps.contains), "a ranked key is not a supplier")
  }

  test("h_rollup_incremental: the maintained rollup equals a full recompute") {
    val merged = TrainingOps.hRollupIncremental(spark, sf).collect()
    val full = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "size(split(text, ' ')) AS t", "n_chars")
      .groupBy("lang").agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("t").as("tok"),
        org.apache.spark.sql.functions.sum("n_chars").as("ch"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    merged.foreach { r =>
      val (n, tok, ch) = full(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == tok && r.getLong(3) == ch,
        s"${r.getString(0)}: incremental merge drifted from full recompute")
    }
  }

  test("h_winsorize: bounds ordered, clipping bounded, winsorized mean inside the clip range") {
    val rows = LlmOps.hWinsorize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo <= hi)
      assert(r.getLong(4) + r.getLong(5) < n, "everything clipped — quantiles degenerate")
      val wmean = r.getLong(6)
      assert(wmean >= 10000 * lo && wmean <= 10000 * hi,
        s"winsorized mean $wmean outside [${10000 * lo}, ${10000 * hi}]")
    }
  }

  test("h_embed_truncate: keep-ratio buckets bounded by 1.0, every vector accounted") {
    val rows = LlmOps.hEmbedTruncate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 10),
      "a truncation keep-ratio exceeded 1.0 — norms are broken")
    val total = rows.map(_.getLong(2)).sum
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(total <= vecs && total > 0)
  }

  test("g_anomaly: the planted spike flags, normal days mostly don't") {
    val rows = AnalyticsOps.gAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    val flagged = rows.count(_.getBoolean(2))
    assert(flagged >= 1, "the planted 3x-max spike day must flag (z ~ sqrt(n) > 3)")
    assert(flagged < rows.length, "every day anomalous — the moments are broken")
    // the spike is the LAST day by construction and must be among the flags
    assert(rows.maxBy(_.getDate(0).getTime).getBoolean(2), "spike day not flagged")
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("h_bigram_lm: buckets in range, held-out docs conserved") {
    val rows = LlmOps.hBigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 9), "bucket out of range")
    val scored = rows.map(_.getLong(2)).sum
    // every held-out doc with >=2 tokens scores into exactly one bucket
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .where("doc_id % 3 = 0 AND size(split(text, ' ')) >= 2").count()
    assert(scored == expected, s"scored $scored of $expected held-out docs")
  }

  test("q21_waiting: decorrelated to semi+anti joins, waits positive and descending") {
    val df = RelationalQueries.q21Waiting(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val waits = rows.map(_.getLong(1))
    assert(waits.forall(_ > 0))
    assert(waits.zip(waits.tail).forall { case (a, b) => a >= b }, "numwait ordering broken")
    // the EXISTS/NOT EXISTS must become join operators, never a per-row rescan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS did not decorrelate to a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS did not decorrelate to an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // every reported supplier is real and from a nation below the key cut
    val ok = spark.read.parquet(s"$sf/supplier.parquet")
      .where("s_nationkey < 13").select("s_name").collect().map(_.getString(0)).toSet
    assert(rows.forall(r => ok(r.getString(0))), "supplier outside the nation-key cut")
  }
}
