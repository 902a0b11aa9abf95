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

  test("h_dp_release: noise is the pinned two-sided geometric ladder; ledger and clamp hold") {
    // exhaustively enumerate the noise mapper over a full dyadic draw
    // range: trailing zeros of a uniform integer are Geometric(1/2), so
    // with the cap bit at 2^12 and sign at bit 21 the counts must be
    // EXACTLY n/2 at 0 and n/2^(k+2) at each of +-k (k < 12)
    val n = 1 << 16
    val hist = spark.sql(
      s"""SELECT noise, count(*) AS c FROM (
         |  SELECT (CASE WHEN (id >> 21) & 1 = 1 THEN 1 ELSE -1 END)
         |    * (length(bin((id | 4096) & -(id | 4096))) - 1) AS noise
         |  FROM (SELECT explode(sequence(0, ${n - 1})) AS id))
         |GROUP BY noise""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // ids 0..65535 never reach bit 21 => sign always -1; fold to magnitude
    val mag = hist.map { case (k, c) => math.abs(k) -> c }
    assert(mag(0) === n / 2L)
    (1 until 12).foreach(k => assert(mag(k) === (n >> (k + 1)).toLong, s"magnitude $k"))
    assert(mag(12) === (n >> 12).toLong, "cap bin collects the tail")

    val rows = GovernanceOps.hDpRelease(spark, sf).collect()
    assert(rows.nonEmpty && rows.length % 2 == 0, "two releases per lang")
    rows.foreach { r =>
      val (tru, noise, released, err, eps, tot) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(released === math.max(0L, tru + noise), "clamp")
      assert(err === math.abs(released - tru), "abs error")
      assert(math.abs(noise) <= 20, "noise magnitude capped at 20")
      assert(eps === 1L && tot === 2L, "epsilon ledger: 1 unit per release, 2 per lang")
    }
  }

  test("h_pii_census: detection equals the planting exactly, decoys never fire, scrub residual is zero") {
    val rows = GovernanceOps.hPiiCensus(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getBoolean(10)))
    assert(rows.nonEmpty)
    // Scala referee for the planting draw: md5("pii" + doc_id) first 15 hex
    // chars as a non-negative Long — the same draw both engines replay
    def draw(docId: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pii$docId".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val langCount = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected: Map[(String, String), Long] = docs.flatMap { case (id, lang) =>
      val h = draw(id)
      Seq(if (h % 5 == 0) Some((lang, "email")) else None,
        if (h % 7 == 0) Some((lang, "phone")) else None,
        if (h % 11 == 0) Some((lang, "id")) else None).flatten
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (lang, pat, nDocs, nDocsHit, nHits, nPlanted,
        detectExact, densityMilli, spanChars, nResid, scrubClean) =>
      assert(nDocs == langCount(lang), s"$lang/$pat n_docs")
      assert(nPlanted == expected.getOrElse((lang, pat), 0L),
        s"$lang/$pat: planted count disagrees with the Scala referee")
      assert(nHits == nPlanted && detectExact,
        s"$lang/$pat: detector caught $nHits of $nPlanted planted spans " +
          "(an over-greedy regex catches decoys, an under-greedy one misses plants)")
      assert(nDocsHit == nPlanted, s"$lang/$pat: one planted span per selected doc")
      assert(densityMilli == 1000L * nDocsHit / nDocs, s"$lang/$pat density")
      assert(spanChars >= nHits * 7, s"$lang/$pat: spans implausibly short")
      assert(nResid == 0 && scrubClean, s"$lang/$pat: scrub left $nResid residual hits")
    }
    // all three patterns appear for every language
    assert(rows.map(r => (r._1, r._2)).toSet ==
      langCount.keySet.flatMap(l => Set((l, "email"), (l, "phone"), (l, "id"))))
  }
}
