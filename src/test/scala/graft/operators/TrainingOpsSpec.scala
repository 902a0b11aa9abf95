package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkSuite, Tables}

class TrainingOpsSpec extends SparkSuite {

  test("h_dup_clusters: every doc pairs with its planted mutation, so no singletons") {
    val hist = TrainingOps.hDupClusters(spark, SparkSpec.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hist.nonEmpty)
    assert(!hist.contains(1L), s"planted near-dups leave no singleton clusters: $hist")
    // every cluster holds originals and their +1000000 twins in equal
    // number, so sizes are even and the total node count is 2 × docs
    assert(hist.keys.forall(_ % 2 == 0), s"cluster sizes must be even: $hist")
    val nodes = hist.map { case (size, n) => size * n }.sum
    val docs = Tables.load(spark, SparkSpec.sf0001, "documents").count()
    assert(nodes == 2 * docs, s"$nodes nodes vs ${2 * docs} corpus docs")
  }

  test("h_sample_split: content-hash split is stable and partitions the corpus") {
    val rows = TrainingOps.hSampleSplit(spark, SparkSpec.sf0001).collect()
    val total = rows.map(_.getLong(2)).sum
    val docs = Tables.load(spark, SparkSpec.sf0001, "documents").count()
    assert(total == docs, "splits partition the corpus exactly")
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
    // determinism: a second run over a reshuffled scan lands identically
    val again = TrainingOps.hSampleSplit(spark, SparkSpec.sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("h_seq_packing: chunk accounting conserves tokens") {
    val rows = TrainingOps.hSeqPacking(spark, SparkSpec.sf0001).collect()
    val totalTokens = rows.map(_.getLong(2)).sum
    val expected = Tables.load(spark, SparkSpec.sf0001, "documents")
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(totalTokens == expected, "every token lands in exactly one chunk")
    rows.foreach { r =>
      val (nChunks, total, maxTok, maxDocs) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // a new chunk opens only after 512 tokens started in the previous
      // one, so per pack group chunks ≥ ceil(tokens/512) never overshoots
      // by more than the group count; and every chunk holds ≥ 1 doc
      assert(nChunks <= total / 512 + 8, s"too many chunks: $r")
      assert(maxTok >= 1 && maxDocs >= 1 && nChunks >= 1, s"degenerate: $r")
    }
  }

  test("h_decontaminate: benchmark docs are excluded from the training counts") {
    val rows = TrainingOps.hDecontaminate(spark, SparkSpec.sf0001).collect()
    val nTrain = rows.map(_.getLong(1)).sum
    val d = Tables.load(spark, SparkSpec.sf0001, "documents")
    val expected = d.filter(col("doc_id") % 17 =!= 0).count()
    assert(nTrain == expected)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "contaminated ⊆ train")
      assert(r.getLong(3) <= r.getLong(4), "hit grams ⊆ total grams")
    }
  }

  test("h_ngram_novelty: novelty is a valid fraction of the batch gram set") {
    val rows = TrainingOps.hNgramNovelty(spark, SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, total, novel, millis) =>
      assert(total > 0, s"$lang: empty batch gram set")
      assert(novel >= 0 && novel <= total, s"$lang: novel $novel outside [0, $total]")
      assert(millis == novel * 1000 / total, s"$lang: novelty arithmetic drifted")
    }
  }

  test("h_token_budget_mix: prefix cut respects every budget and wastes at most one document") {
    val rows = TrainingOps.hTokenBudgetMix(spark, SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, budget, nKept, keptToks, utilMillis) =>
      assert(budget > 0 && nKept > 0, s"$lang: empty selection")
      assert(keptToks <= budget, s"$lang: kept $keptToks tokens over budget $budget")
      assert(utilMillis == keptToks * 1000 / budget, s"$lang: utilization arithmetic drifted")
      // the cut is a maximal prefix: the only waste is the one document
      // that would have crossed the line — so the gap is bounded by the
      // largest doc, loosely bounded here by the budget itself
      assert(utilMillis >= 500,
        s"$lang: utilization $utilMillis millis — prefix cut is leaving budget unspent")
    }
  }

  test("h_minhash_calibration: agreement separates the similarity ends") {
    // Strict monotonicity is too strong on any finite sample (mid-range
    // agreement levels can hold 1-2 pairs), but the CALIBRATION property —
    // high signature agreement means high exact Jaccard, zero agreement
    // means near-zero — must hold on any input, or the LSH thresholds the
    // dedup family trusts are uncalibrated.
    val rows = TrainingOps.hMinhashCalibration(spark, SparkSpec.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) // (agree, n, mean_millis)
    assert(rows.nonEmpty)
    rows.foreach { case (a, n, m) =>
      assert(a >= 0 && a <= 8 && n > 0 && m >= 0 && m <= 1000, s"out of range: ($a,$n,$m)")
    }
    val byAgree = rows.map(r => r._1 -> r._3).toMap
    // the planted stripped copies (J≈0.95) dominate full agreement...
    assert(byAgree.get(8).exists(_ >= 800),
      s"full signature agreement must mean near-duplicate: $byAgree")
    // ...and unrelated block pairs dominate zero agreement
    assert(byAgree.get(0).exists(_ <= 200),
      s"zero signature agreement must mean near-disjoint: $byAgree")
  }

  test("h_importance_sample: exact top-20% quota, selected mean dominates corpus mean") {
    val rows = TrainingOps.hImportanceSample(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, nDocs, nSel) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (selSum, allSum, cutoff) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nSel == nDocs / 5, s"$lang: quota must be floor(n/5): $nSel of $nDocs")
      // the selection is the TOP quota by score, so its mean can never
      // fall below the corpus mean (cross-multiplied, no FP division)
      assert(selSum * nDocs >= allSum * nSel,
        s"$lang: selected mean below corpus mean: $selSum/$nSel vs $allSum/$nDocs")
      // the cutoff is the WORST selected score: quota * cutoff is a lower
      // bound on the selected sum, and no doc beats the +64-shift ceiling
      assert(selSum >= nSel * cutoff, s"$lang: cutoff $cutoff contradicts sum $selSum")
      assert(cutoff <= 0, s"$lang: target slice is a subset of raw, so " +
        s"log2(tgt+1) <= log2(raw+1) bucket-wise and no score is positive: $cutoff")
    }
  }

  test("c_join_asof: matched purchase is the latest at-or-before each click") {
    val out = ScaleOps.cJoinAsof(spark, SparkSpec.sf0001).collect()
    assert(out.nonEmpty)
    val e = Tables.eventsCanonical(spark, SparkSpec.sf0001)
      .select(col("event_id"), col("user_id"), col("tus"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchases = e.filter(_._4 == "purchase")
    out.foreach { r =>
      val (clickId, user) = (r.getLong(0), r.getLong(1))
      val clickTus = e.find(_._1 == clickId).get._3
      val prior = purchases.filter(p => p._2 == user && p._3 <= clickTus)
      if (r.isNullAt(2)) assert(prior.isEmpty, s"click $clickId should have a match")
      else {
        val best = prior.maxBy(p => (p._3, p._1))
        assert(r.getLong(2) == best._1, s"click $clickId matched ${r.getLong(2)}, want ${best._1}")
        assert(r.getLong(3) == clickTus - best._3)
      }
    }
  }

  test("c_join_bloom: pruned join equals the plain filtered join") {
    val plain = Tables.load(spark, SparkSpec.sf0001, "lineitem")
      .join(Tables.load(spark, SparkSpec.sf0001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).count().orderBy(col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val pruned = ScaleOps.cJoinBloom(spark, SparkSpec.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(pruned === plain)
  }

  test("h_chunking: overlap accounting is exact — sum_tokens = corpus + 32·(chunks − docs)") {
    val rows = TrainingOps.hChunking(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    val corpus = Tables.load(spark, SparkSpec.sf0001, "documents")
      .groupBy(col("lang")).agg(sum(size(split(col("text"), " "))).as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, nDocs, nChunks, sumTokens) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // every non-final window re-consumes exactly the 32-token boundary,
      // so total emitted tokens exceed the corpus by 32 per extra chunk
      assert(sumTokens == corpus(lang) + 32 * (nChunks - nDocs),
        s"$lang: $sumTokens tokens vs corpus ${corpus(lang)} + 32*(${nChunks}-${nDocs})")
      assert(nChunks >= nDocs)
    }
  }

  test("h_chunking: chunk count is exact at the window/stride boundaries") {
    // ceil((n-32)/96) min 1: a doc shorter than one window yields one
    // chunk; n=129 is the first length needing two; n=225 the first
    // needing three. Each length is its own lang so the declared
    // per-lang aggregate exposes every case separately.
    import spark.implicits._
    val lengths = Seq(1, 32, 33, 128, 129, 224, 225, 320, 321)
    lengths.map { n => (n.toLong, Seq.fill(n)("w").mkString(" "), s"L$n") }
      .toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
    val got = TrainingOps.chunkingDf(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    def expChunks(n: Int) = math.max(1, math.ceil((n - 32) / 96.0).toInt)
    lengths.foreach { n =>
      val (chunks, toks) = got(s"L$n")
      assert(chunks == expChunks(n), s"n=$n: $chunks chunks, want ${expChunks(n)}")
      assert(toks == n + 32 * (chunks - 1), s"n=$n: token conservation broke")
    }
  }

  test("h_span_corruption: length accounting exact; coverage near the hash-grid rate") {
    val rows = TrainingOps.hSpanCorruption(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, nDocs, total) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (corr, spans) = (r.getLong(3), r.getLong(4))
      val (corrM, spanLenM) = (r.getLong(5), r.getLong(6))
      val (in, tgt, ovh, chk) = (r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))
      // every merged span covers at least one token
      assert(spans <= corr, s"$lang: $spans spans but only $corr covered tokens")
      // T5 length accounting: encoder keeps the uncovered tokens plus one
      // sentinel per span; decoder emits covered + sentinels + EOS per doc
      assert(in == total - corr + spans, s"$lang input accounting")
      assert(tgt == corr + spans + nDocs, s"$lang target accounting")
      assert(ovh == 1000L * (2 * spans + nDocs) / total, s"$lang overhead")
      assert(corrM == 1000L * corr / total && corrM > 60 && corrM < 260,
        s"$lang coverage $corrM out of band for the 1/20-start 3-token grid")
      // a merged span is >= 1 token (end truncation) and averages a bit
      // over 3 — overlapping starts CHAIN, so islands can run past one
      // span's width; the 1/20 start rate keeps the expected chain short
      assert(spanLenM >= 1000 && spanLenM <= 4500,
        s"$lang mean merged-span length $spanLenM outside the [1, 4.5] band")
      assert(chk > 0, s"$lang mask checksum must pin real content")
    }
  }

  test("h_prefix_cache: every cell recomputes exactly from a prefix-group referee") {
    val rows = TrainingOps.hPrefixCache(spark, graft.SparkSpec.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, graft.SparkSpec.sf0001, "documents")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(' ')))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val groups = ds.map(_._2).groupBy(_.take(2).mkString(" "))
      val nDocs = ds.length.toLong
      val shared = groups.valuesIterator.filter(_.length > 1).map(_.length.toLong).sum
      val toks = ds.map(_._2.length.toLong).sum
      val saved = groups.collect { case (p, g) if g.length > 1 =>
        (g.length - 1).toLong * p.split(' ').length
      }.sum
      val (gn, gp, gsh, gshm, gt, gsv, gsvm) = rows(lang)
      assert(gn == nDocs && gp == groups.size.toLong && gsh == shared,
        s"$lang: group census diverged")
      assert(gshm == 1000L * shared / nDocs, s"$lang shared_milli")
      assert(gt == toks && gsv == saved, s"$lang token accounting")
      assert(gsvm == 1000L * saved / toks, s"$lang saved_milli")
      // a cached prefix saves at most its own length per doc
      assert(saved <= 2L * shared, s"$lang: savings exceed the 2-token page")
    }
  }

  test("h_minhash_band_design: theory matches the closed form; dominance and cost orderings hold") {
    val rows = TrainingOps.hMinhashBandDesign(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._2)
    assert(rows.map(_._1).toSeq == Seq("1x8", "2x4", "4x2", "8x1"))
    // exact truncating-integer S-curve referee: 1 - (1 - 0.6^r)^b in micros
    def pow(base: Long, e: Long): Long =
      if (e == 1) base else { val h = pow(base, e / 2); h * h / 1000000L }
    rows.foreach { case (_, b, r, theory, _, _, _, _) =>
      assert(b * r == 8L, "rungs factorize the 8-perm signature")
      assert(theory == 1000000L - pow(1000000L - pow(600000L, r), b),
        s"${b}x$r theory diverged from the closed form")
    }
    // a match in a WIDER band implies a match at every narrower rung, so
    // recall is monotone in n_bands; more bands also means more bucket
    // memberships, so candidate volume is monotone too
    val hits = rows.map(_._7); val cand = rows.map(_._5)
    assert(hits.zip(hits.tail).forall { case (a, c) => a <= c },
      s"planted hits not monotone in bands: ${hits.toSeq}")
    assert(cand.zip(cand.tail).forall { case (a, c) => a <= c },
      s"candidate volume not monotone in bands: ${cand.toSeq}")
    rows.foreach { case (rung, _, _, _, candP, np, hit, recall) =>
      assert(np > 0 && hit <= np && recall == 1000L * hit / np, s"$rung accounting")
      assert(candP >= hit, s"$rung: colliding planted pairs are themselves candidates")
    }
    // the design tension is real on this corpus: the widest band must be
    // cheapest, the narrowest most complete
    assert(cand.head == cand.min && hits.last == hits.max)
  }

  test("h_survivor_provenance: generation algebra consistent with the survivor report") {
    val prov = TrainingOps.hSurvivorProvenance(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(prov.nonEmpty)
    prov.foreach { case (lang, gen, ns, nb) =>
      assert(gen >= 0 && gen <= 3, s"$lang gen $gen outside the 4 snapshots")
      assert(nb >= 0 && nb <= ns, s"$lang gen $gen backdated > survivors")
      // a cluster whose earliest sighting is the NEWEST wave cannot have a
      // keeper from an even newer one
      if (gen == 3) assert(nb == 0, s"$lang: gen-3 clusters cannot backdate")
    }
    // the per-generation split partitions EXACTLY the survivor totals the
    // dedup-action report publishes
    val surv = TrainingOps.hDedupSurvivors(spark, graft.SparkSpec.sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    prov.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._3).sum == surv(lang),
        s"$lang: provenance rows do not partition the survivor count")
    }
  }

  test("h_epoch_shuffle: the resume window equals a full Scala replay of the shard draw") {
    val rows = TrainingOps.hEpochShuffle(spark, SparkSpec.sf0001).collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows.nonEmpty)
    // replay md5("ord" + ep + ":" + doc_id) % 1024 for every (doc, epoch)
    def shard(ep: Long, docId: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ord$ep:$docId".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16) % 1024
    }
    val docs = spark.read.parquet(s"${SparkSpec.sf0001}/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fills = scala.collection.mutable.Map[(Long, String, Long), (Long, Long)]()
    for ((id, src, nc) <- docs; ep <- 0L to 2L) {
      val step = ep * 1024 + shard(ep, id)
      if (step >= 960 && step < 1088)
        fills.updateWith((ep, src, step)) {
          case Some((n, t)) => Some((n + 1, t + nc / 4)); case None => Some((1L, nc / 4))
        }
    }
    val exp = fills.groupBy { case ((ep, src, _), _) => (ep, src) }.map { case (k, m) =>
      val ns = m.values.map(_._1)
      k -> ((ns.sum, m.size.toLong, ns.min, ns.max, m.values.map(_._2).sum))
    }
    // determinism + boundary: the window must span the epoch-0 -> 1 seam
    assert(exp.keys.map(_._1).toSet == Set(0L, 1L), "window does not span the epoch boundary")
    assert(rows == exp, "query output diverged from the Scala shard-draw replay")
  }
}
