package graft.operators

import graft.{SparkSpec, SparkSuite}

/** Semantic invariants for the governance group — properties that hold on
  * ANY corpus, complementing the hash oracle's pinned answer. */
class GovernanceOpsSpec extends SparkSuite {

  private val sf = SparkSpec.sf0001

  test("h_k_anonymity: suppressed + kept conserve the corpus, k_achieved honors k") {
    val rows = GovernanceOps.hKAnonymity(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, groups, sgroups, sdocs, kdocs, k) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sgroups <= groups, s"$lang: suppressed groups exceed groups")
      assert(sdocs + kdocs == docs(lang),
        s"$lang: suppressed $sdocs + kept $kdocs != corpus ${docs(lang)}")
      assert(k == 0 || k >= 5, s"$lang: a kept group has fewer than k=5 docs (k=$k)")
      assert(sdocs < sgroups * 5, s"$lang: a suppressed group holds >= k docs")
    }
  }

  test("h_dist_drift: TVD in [0, 1000] and never zero, generation totals match the derivation") {
    val rows = GovernanceOps.hDistDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val v1 = base.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = base.filter("doc_id % 11 <> 0").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val added = base.filter("doc_id % 13 = 0").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, na, nb, mil) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5))
      assert(na == v1(lang), s"$lang: v1 total $na != corpus ${v1(lang)}")
      assert(nb == kept(lang) + added.getOrElse(lang, 0L),
        s"$lang: v2 total $nb != kept+added")
      assert(mil >= 0 && mil <= 1000, s"$lang: TVD millis out of range: $mil")
      // the derivation drops and adds docs, so the histograms cannot be identical
      assert(r.getLong(4) > 0, s"$lang: zero TVD numerator — drift went undetected")
    }
  }

  test("h_fuzzy_match: bands partition the candidates, distances bounded by the band") {
    val rows = GovernanceOps.hFuzzyMatch(spark, sf).collect()
    assert(rows.nonEmpty)
    var fuzzyTotal = 0L
    rows.foreach { r =>
      val (cand, exact, fuzzy, dist) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(exact + fuzzy <= cand, "exact+fuzzy exceed candidates")
      assert(dist >= fuzzy && dist <= 5 * fuzzy,
        s"sum_dist $dist outside [$fuzzy, ${5 * fuzzy}]")
      fuzzyTotal += fuzzy + exact
    }
    assert(fuzzyTotal > 0,
      "no matches at all — the blocking key is too fine to ever pair documents")
  }
}
