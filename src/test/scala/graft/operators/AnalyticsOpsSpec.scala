package graft.operators

import graft.{SparkSpec, SparkSuite}

/** Semantic invariants for the event-analytics / lake-maintenance group —
  * properties that must hold on ANY input, complementing the hash oracle
  * (which pins one dataset's answer). */
class AnalyticsOpsSpec extends SparkSuite {

  private val sf = SparkSpec.sf0001

  test("g_event_funnel: stage populations are monotone non-increasing") {
    val rows = AnalyticsOps.gEventFunnel(spark, sf).collect()
    assert(rows.length == 3)
    val byStage = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("1_view") >= byStage("2_click"),
      s"click-through exceeded views: $byStage")
    assert(byStage("2_click") >= byStage("3_purchase"),
      s"purchases exceeded clicks: $byStage")
    assert(byStage("1_view") > 0)
  }

  test("g_cohort_retention: offsets are non-negative and every cohort has a week-0 row") {
    val rows = AnalyticsOps.gCohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 0), "negative week offset")
    val cohorts = rows.map(_.getDate(0)).distinct
    val withZero = rows.filter(_.getLong(1) == 0).map(_.getDate(0)).distinct
    // a user's first event lands in their cohort week by construction
    assert(cohorts.sorted.sameElements(withZero.sorted),
      "some cohort is missing its week-0 activity row")
  }

  test("g_gap_fill: the hour axis is dense — per-day hours sum to the full inclusive range") {
    val rows = AnalyticsOps.gGapFill(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) <= 24), "a day reported more than 24 hours")
    val totalHours = rows.map(_.getLong(1)).sum
    val gapHours = rows.map(_.getLong(2)).sum
    val events = rows.map(_.getLong(3)).sum
    assert(gapHours > 0, "threshold produced no gaps — the fill is untested")
    assert(gapHours < totalHours, "every hour is a gap — the sparse side is empty")
    assert(events > 0)
  }

  test("d_regression: r² in [0,1], moments cover the whole table") {
    val rows = AnalyticsOps.dRegression(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val r2 = r.getDouble(6)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r² out of range: $r2")
    }
    val n = rows.map(_.getLong(1)).sum
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(n == total, s"moment rows $n != lineitem rows $total")
  }

  test("a_compaction_bins: bins are contiguous per month and conserve file counts and bytes") {
    val rows = AnalyticsOps.aCompactionBins(spark, sf).collect()
    assert(rows.nonEmpty)
    val byMonth = rows.groupBy(_.getDate(0))
    byMonth.foreach { case (m, rs) =>
      val bins = rs.map(_.getLong(1)).sorted
      assert(bins.head == 0L, s"$m: first bin is ${bins.head}, not 0")
      assert(bins.sameElements(bins.head to bins.last),
        s"$m: bin ids not contiguous: ${bins.mkString(",")}")
      // cumulative binning bounds every bin (except possibly the last) to
      // at least reaching the target, and none exceeds target + max file
      val sizes = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      sizes.dropRight(1).foreach(b => assert(b >= 1,
        s"$m: empty non-final bin"))
    }
  }

  test("h_inverted_index: df <= cf everywhere, ranking is by descending cf") {
    val rows = AnalyticsOps.hInvertedIndex(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"term ${r.getString(0)}: df ${r.getLong(1)} > cf ${r.getLong(2)}")
    }
    val cfs = rows.map(_.getLong(2))
    assert(cfs.zip(cfs.tail).forall { case (a, b) => a >= b }, "cf ordering broken")
  }

  test("h_corpus_merge: action counts reconcile with the base corpus and the delta rules") {
    val rows = AnalyticsOps.hCorpusMerge(spark, sf).collect()
    val byAction = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val total = base.count()
    val deleted = base.filter("doc_id % 11 = 0").count()
    val updated = base.filter("doc_id % 7 = 0 AND doc_id % 11 <> 0").count()
    val inserted = base.filter("doc_id % 13 = 0").count()
    assert(byAction("deleted") == deleted)
    assert(byAction("updated") == updated)
    assert(byAction("inserted") == inserted)
    assert(byAction("kept") == total - deleted - updated)
  }
}
