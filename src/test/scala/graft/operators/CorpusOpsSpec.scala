package graft.operators

import graft.{SparkSpec, SparkSuite}

/** Invariant specs for the round-16 retrieval-family operators — the
  * algebraic facts the DuckDB hash-compare can't state (it proves both
  * engines agree, not that the agreed answer obeys the op's contract). */
class CorpusOpsSpec extends SparkSuite {

  test("h_rrf_fusion: 5 fused picks per query, scores bounded and rank-monotone") {
    val rows = CorpusOps.hRrfFusion(spark, SparkSpec.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 50, s"10 queries x top-5, got ${rows.length}")
    val maxArm = 1000000L / 61L // rank 1 in one arm
    rows.foreach { case (q, d, lex, sem, rrf, rnk) =>
      assert(rnk >= 1 && rnk <= 5)
      assert(lex == -1 || (lex >= 1 && lex <= 20), s"q$q d$d lex=$lex")
      assert(sem == -1 || (sem >= 1 && sem <= 20), s"q$q d$d sem=$sem")
      // at least one arm retrieved the doc, and the score is exactly the
      // sum of its per-arm reciprocal contributions
      assert(lex != -1 || sem != -1)
      val expect = (if (lex == -1) 0L else 1000000L / (60 + lex)) +
        (if (sem == -1) 0L else 1000000L / (60 + sem))
      assert(rrf == expect, s"q$q d$d rrf=$rrf expected $expect")
      assert(rrf > 0 && rrf <= 2 * maxArm)
    }
    // fused score is non-increasing down each query's ranks
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._6).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"q$q fused scores not monotone: ${byRank.toSeq}")
      assert(rs.map(_._2).distinct.length == 5, s"q$q picked a doc twice")
    }
  }

  test("h_mmr_diversify: pick 1 is the relevance top-1; later scores never beat pure relevance") {
    val mmr = CorpusOps.hMmrDiversify(spark, SparkSpec.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(mmr.length == 50)
    // rank 1 is pure relevance — it must equal h_ann_brute's top-1 for
    // the same panel (same corpus, same deterministic cosine order)
    val bruteTop = LlmOps.hAnnBrute(spark, SparkSpec.sf0001).filter("rnk = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    mmr.filter(_._3 == 1L).foreach { case (q, d, _, relT, score) =>
      assert(bruteTop(q) == d, s"q$q MMR pick 1 $d != brute top-1 ${bruteTop(q)}")
      assert(score == 7 * relT, s"q$q pick-1 score must be pure relevance")
    }
    mmr.foreach { case (q, d, rnk, relT, score) =>
      // 0.7·rel − 0.3·maxsim ≤ 0.7·rel always (sim ≥ 0 fails for negative
      // cosines, but the BOUND 7·relT − 3·(−10000) caps everything)
      assert(score <= 7 * relT + 30000, s"q$q d$d score $score vs rel $relT")
      assert(rnk >= 1 && rnk <= 5)
    }
    mmr.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).distinct.length == 5, s"q$q selected a doc twice")
    }
  }

  test("h_rag_context_pack: prefix-cut semantics — packed set is exactly the rank prefix") {
    val rows = CorpusOps.hRagContextPack(spark, SparkSpec.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 10)
    rows.foreach { case (q, nPacked, tokens, fill, cut, checksum) =>
      assert(nPacked == cut - 1, s"q$q packed $nPacked but first cut at $cut")
      assert(tokens <= 512, s"q$q packed $tokens tokens over the 512 budget")
      assert(fill == 1000L * tokens / 512, s"q$q fill $fill vs tokens $tokens")
      assert(nPacked == 0 || checksum > 0)
      assert(cut >= 1 && cut <= 21)
    }
  }

  test("h_quality_classifier: confusion matrix is internally consistent") {
    val rows = CorpusOps.hQualityClassifier(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, nTest, nPos) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (tp, fp, fn, tn) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      val (prec, rec, acc) = (r.getLong(7), r.getLong(8), r.getLong(9))
      assert(tp + fp + fn + tn == nTest, s"$lang: cells must sum to the test set")
      assert(tp + fn == nPos, s"$lang: positives must split into tp + fn")
      assert(acc == 1000L * (tp + tn) / nTest, s"$lang: accuracy mismatch")
      if (tp + fp > 0) assert(prec == 1000L * tp / (tp + fp)) else assert(prec == -1L)
      if (nPos > 0) assert(rec == 1000L * tp / nPos) else assert(rec == -1L)
    }
    // the held-out set is exactly the non-train docs
    val total = rows.map(_.getLong(1)).sum
    val expected = graft.Tables.load(spark, SparkSpec.sf0001, "documents")
      .filter("doc_id % 3 != 0").count()
    assert(total == expected, s"test rows $total vs expected $expected")
  }

  test("h_percentile_norm: threshold and both cuts recompute exactly; norm cut is lang-uniform") {
    val rows = CorpusOps.hPercentileNorm(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, graft.SparkSpec.sf0001, "documents")
      .selectExpr("lang", "CAST(size(split(text, ' ')) AS LONG) AS toks").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // global p80 by the histogram rule: smallest score with 10*cum >= 8*tot
    val sorted = docs.map(_._2).sorted
    val tot = sorted.length
    val rawCut = sorted.zipWithIndex.collectFirst {
      case (v, i) if 10L * (i + 1) >= 8L * tot && (i + 1 == tot || sorted(i + 1) != v || true) => v
    }.get
    // (cum at the LAST occurrence of each value decides; recompute precisely)
    val cutExact = sorted.distinct.find { v =>
      10L * sorted.count(_ <= v) >= 8L * tot
    }.get
    rows.foreach { case (lang, n, cut, nRaw, rawMilli, nNorm, normMilli) =>
      assert(cut == cutExact, s"$lang: raw_cut $cut != referee $cutExact (first guess $rawCut)")
      val ts = docs.filter(_._1 == lang).map(_._2)
      assert(n == ts.length.toLong)
      assert(nRaw == ts.count(_ >= cutExact).toLong, s"$lang raw survivors")
      assert(rawMilli == 1000L * nRaw / n)
      // exact integer percent_rank with rank() tie semantics
      val srt = ts.sorted
      val expNorm =
        if (ts.length == 1) 0L
        else ts.count { t =>
          val rank = srt.indexWhere(_ == t) + 1 // rank() = 1 + count(strictly smaller)
          1000L * (rank - 1) / (ts.length - 1) >= 800L
        }.toLong
      assert(nNorm == expNorm, s"$lang norm survivors $nNorm != referee $expNorm")
      assert(normMilli == 1000L * nNorm / n)
      // the normalized cut is ~uniform per lang (ties can only SHRINK the
      // pass set below the nominal 200 per mille, never inflate it)
      assert(normMilli <= 210L, s"$lang: norm cut passes ${normMilli} per mille > nominal")
    }
  }

  test("h_ctfidf_topics: every class's top-3 recomputes exactly from the class-vocab referee") {
    val rows = CorpusOps.hCtfidfTopics(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val toks = graft.Tables.load(spark, graft.SparkSpec.sf0001, "documents")
      .selectExpr("source", "text").collect()
      .flatMap(r => r.getString(1).split(' ').map(t => (r.getString(0), t)))
    val ctf = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nsrc = toks.map(_._1).distinct.length.toLong
    val srcDf = ctf.keys.toSeq.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expected = ctf.toSeq
      .map { case ((src, t), c) => (src, t, c * bitlen(4 * nsrc / srcDf(t))) }
      .groupBy(_._1).toSeq.flatMap { case (_, ts) =>
        ts.sortBy { case (_, t, sc) => (-sc, t) }.take(3).zipWithIndex
          .map { case ((src, t, sc), i) => (src, t, sc, i + 1L) }
      }.sortBy { case (src, _, _, rnk) => (src, rnk) }
    assert(rows.toSeq == expected, "c-TF-IDF top-3 diverged from the referee")
    // every class present, rnk dense from 1, scores non-increasing
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._4).sorted.sameElements(1L to rs.length),
        s"$src: ranks not dense")
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"$src: scores increase down the ranks")
    }
  }

  test("h_zipf_audit: moments recompute exactly; slope is negative (frequency falls with rank)") {
    val rows = CorpusOps.hZipfAudit(spark, graft.SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    val tf = graft.Tables.load(spark, graft.SparkSpec.sf0001, "documents")
      .selectExpr("lang", "explode(split(text, ' ')) AS term").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view.mapValues(_.map { case ((_, t), c) => t -> c }).toMap
    def bl(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    rows.foreach { r =>
      val lang = r.getString(0)
      val counts = tf(lang)
      val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(64)
      val pts = top.zipWithIndex.map { case ((_, c), i) => (bl(i + 1L), bl(c)) }
      val (n, sx, sy) = (pts.length.toLong, pts.map(_._1).sum, pts.map(_._2).sum)
      assert(r.getLong(1) == n && r.getLong(2) == sx && r.getLong(3) == sy,
        s"$lang: OLS moments diverged from the referee")
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val expSlope = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
      assert(math.abs(r.getDouble(4) - expSlope) < 1e-12, s"$lang slope")
      assert(r.getDouble(4) < 0, s"$lang: Zipf slope must be negative")
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1 + 1e-12, s"$lang r2 in [0,1]")
      val tot = counts.values.sum
      assert(r.getLong(6) == 1000L * top.head._2 / tot, s"$lang head share")
    }
  }

  test("h_compression_screen: probe docs fire both flag paths, bands exact") {
    val rows = CorpusOps.hCompressionScreen(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val langs = rows.map(_._1).distinct
    langs.foreach { l =>
      val rep = rows.filter(r => r._1 == l && r._2 == "repetitive")
      val noi = rows.filter(r => r._1 == l && r._2 == "suspect_noise")
      // the planted probes score EXACTLY: 'aa 'x80 -> 166 permille,
      // 64-distinct-char string -> 875 permille
      assert(rep.exists(r => r._4 == 166 && r._5 == 166), s"$l repetitive probe")
      assert(noi.exists(r => r._4 == 875 && r._5 == 875), s"$l noise probe")
      rows.filter(r => r._1 == l && r._2 == "clean").foreach { r =>
        assert(r._4 > 300 && r._5 < 700, s"$l clean band outside (300,700)")
        assert(r._6 >= r._4 && r._6 <= r._5, s"$l avg outside min/max")
      }
    }
    // every doc plus exactly 2 probes per lang is banded
    val nDocs = spark.read.parquet(s"${graft.SparkSpec.sf0001}/documents.parquet").count()
    assert(rows.map(_._3).sum == nDocs + 2 * langs.length)
  }

  test("h_domain_rollup: canonicalization collapses the re-crawl variants exactly") {
    val rows = CorpusOps.hDomainRollup(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"${graft.SparkSpec.sf0001}/documents.parquet").count()
    val psl = Seq(".com", ".org", ".net", ".co.uk", ".com.au", ".github.io")
    rows.foreach { case (etld1, nd, nraw, ncanon, nhosts, share, flag) =>
      // the collapse invariant: every doc contributes 2 raw URLs (crawl +
      // re-crawl variant) that canonicalize to ONE URL on one host
      assert(nraw == 2 * nd, s"$etld1 raw != 2x docs")
      assert(ncanon == nd, s"$etld1 canonical URLs != docs (variant failed to collapse)")
      assert(nhosts == 1, s"$etld1 spans $nhosts hosts")
      assert(psl.exists(etld1.endsWith), s"$etld1 not under a known public suffix")
      // eTLD+1 means exactly ONE label left of the public suffix
      val label = psl.collectFirst { case sfx if etld1.endsWith(sfx) => etld1.dropRight(sfx.length) }.get
      assert(!label.contains('.'), s"$etld1 carries more than one label")
      assert(share == 1000L * nd / nDocs, s"$etld1 share")
      assert(flag == (1000L * nd >= 10L * nDocs), s"$etld1 cap flag")
    }
    assert(rows.map(_._2).sum == nDocs, "every doc rolls up to exactly one domain")
  }

  test("h_boilerplate_strip: extraction rule replayed exactly, planted adversary fires") {
    val rows = CorpusOps.hBoilerplateStrip(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = spark.read.parquet(s"${graft.SparkSpec.sf0001}/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // referee: the longest-block rule in plain Scala over the same synthesis
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val exact = ds.count { case (id, source, text) =>
        val blocks = Seq(
          s"home | about | $source topics",
          text,
          ("all rights reserved " * 7) + source + " terms") ++
          (if (id % 3 == 0) Seq("we use cookies accept decline") else Nil)
        blocks.sortBy(b => (-b.length, b)).head == text
      }
      src -> exact.toLong
    }
    rows.foreach { case (src, nDocs, nExact, exactMilli, contentMilli) =>
      assert(nExact == expected(src), s"$src: referee disagrees on exact extractions")
      assert(exactMilli == 1000L * nExact / nDocs, s"$src exact_milli")
      assert(contentMilli > 0 && contentMilli < 1000, s"$src content ratio out of band")
    }
    assert(rows.map(_._2).sum == docs.length)
    // the planted disclaimer must defeat the heuristic somewhere, or the
    // audit is vacuous
    assert(rows.map(_._3).sum < docs.length, "no extraction failures: adversary never fired")
    assert(rows.map(_._3).sum > 0, "extractor never succeeded")
  }

  test("h_license_compliance: every doc lands under exactly one policy, shares close per source") {
    val rows = CorpusOps.hLicenseCompliance(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"${graft.SparkSpec.sf0001}/documents.parquet").count()
    assert(rows.map(_._3).sum == nDocs,
      "policy partition must conserve the corpus (one domain, one policy per doc)")
    assert(rows.forall(_._7 == 0L),
      "a doc canonicalized onto more than one registrable domain")
    val policies = Set("allow", "nc", "nd", "optout")
    rows.foreach { case (src, pol, nd, tok, share, excluded, _) =>
      assert(policies.contains(pol), s"$src: unknown policy $pol")
      assert(excluded == (pol == "nd" || pol == "optout"), s"$src/$pol excluded flag")
      assert(nd > 0 && tok > 0 && share >= 0 && share <= 1000, s"$src/$pol bounds")
    }
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val s = rs.map(_._5).sum
      // per-source milli shares floor-round: sum in (1000 - |policies|, 1000]
      assert(s > 1000 - 4 && s <= 1000, s"$src: share_milli sums to $s")
    }
    // the synthesized policy table must actually exclude something somewhere,
    // or the compliance gate is vacuous
    assert(rows.exists(r => r._6), "no source carries any excluded token mass")
  }

  test("h_quality_calibration: thr=0 row equals the classifier's summed confusion matrix; curve is monotone") {
    val rows = CorpusOps.hQualityCalibration(spark, graft.SparkSpec.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (thr, nTest, tp, fp, fn, tn, prec, rec, f1) =>
      assert(tp + fp + fn + tn == nTest, s"thr=$thr cells must sum to the test set")
      if (tp + fp > 0) assert(prec == 1000L * tp / (tp + fp), s"thr=$thr precision")
      else assert(prec == -1L)
      if (tp + fn > 0) assert(rec == 1000L * tp / (tp + fn), s"thr=$thr recall")
      else assert(rec == -1L)
      if (2 * tp + fp + fn > 0) assert(f1 == 2000L * tp / (2 * tp + fp + fn), s"thr=$thr f1")
      else assert(f1 == -1L)
    }
    // raising the threshold can only shrink the predicted-positive set
    rows.sliding(2).foreach {
      case Array((t1, _, tp1, fp1, _, _, _, _, _), (t2, _, tp2, fp2, _, _, _, _, _)) =>
        assert(t1 < t2 && tp2 <= tp1 && fp2 <= fp1,
          s"thr $t1 -> $t2: predicted positives grew (tp $tp1->$tp2, fp $fp1->$fp2)")
      case _ => ()
    }
    // the grid must cross the operating point: both saturations visible
    assert(rows.head._3 + rows.head._4 > rows.last._3 + rows.last._4,
      "threshold sweep never moved the predicted-positive count")
    // cross-pin: the thr=0 row IS h_quality_classifier's decision rule
    val cls = CorpusOps.hQualityClassifier(spark, graft.SparkSpec.sf0001).collect()
    val (ctp, cfp, cfn, ctn) = cls.foldLeft((0L, 0L, 0L, 0L)) { (a, r) =>
      (a._1 + r.getLong(3), a._2 + r.getLong(4), a._3 + r.getLong(5), a._4 + r.getLong(6))
    }
    val z = rows.find(_._1 == 0L).get
    assert((z._3, z._4, z._5, z._6) == (ctp, cfp, cfn, ctn),
      "thr=0 calibration row diverged from the shipped classifier's confusion matrix")
  }

  test("h_encoding_audit: detection equals the Scala-replayed planting; decoys never fire") {
    val rows = CorpusOps.hEncodingAudit(spark, SparkSpec.sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
         r.getBoolean(7) && r.getBoolean(8) && r.getBoolean(9) && r.getBoolean(10),
         r.getLong(11)))).toMap
    assert(rows.nonEmpty)
    // Scala referee: replay the md5("enc" + doc_id) draw and count plants
    def draw(docId: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"enc$docId".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val docs = spark.read.parquet(s"${SparkSpec.sf0001}/documents.parquet")
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2))))
    var decoyDocs = 0L
    val exp = scala.collection.mutable.Map[(String, String), Array[Long]]()
    docs.foreach { case (id, key) =>
      val h = draw(id)
      val a = exp.getOrElseUpdate(key, Array.fill(6)(0L))
      a(0) += 1
      if (h % 17 == 0) a(1) += 1
      if (h % 23 == 0) a(2) += 1
      if (h % 29 == 0) a(3) += 1
      if (h % 31 == 0) a(4) += 1
      if (h % 17 == 0 || h % 23 == 0 || h % 29 == 0 || h % 31 == 0) a(5) += 1
      if (h % 3 == 0) decoyDocs += 1
    }
    // decoys (TAB + bare ©) are planted on ~1/3 of docs — the exclusion
    // below is only meaningful if they actually exist in volume
    assert(decoyDocs > docs.length / 4, s"decoy volume too small: $decoyDocs")
    assert(rows.keySet == exp.keySet)
    rows.foreach { case (key, (n, moji, repl, ctrl, crlf, allExact, milli)) =>
      val a = exp(key)
      assert(n == a(0), s"$key: doc count")
      assert((moji, repl, ctrl, crlf) == ((a(1), a(2), a(3), a(4))),
        s"$key: a detector drifted from the planting (decoy fired?)")
      assert(allExact, s"$key: an *_exact flag is false")
      assert(milli == 1000L * a(5) / a(0), s"$key: unhealthy rate")
    }
  }

  test("h_cosine_calibration: driver-side plane constants equal the SQL md5 sign rule") {
    // Round 20 folded the 32×64 hyperplane sign matrix to driver-computed
    // constant array literals (MessageDigest md5, high nibble of byte 0).
    // The DuckDB twin still derives the SAME signs declaratively via
    // `substring(md5(concat(p, '|', i)), 1, 1) < '8'` — this pins the two
    // derivations to each other, the invariant bit-identical band keys
    // rest on. (The oracle hash-compare would catch a drift too, but only
    // as an opaque mismatch; this names the broken rule directly.)
    val sqlSigns = spark.sql(
      """SELECT p, i,
        |  CASE WHEN substring(md5(concat(CAST(p AS STRING), '|', CAST(i AS STRING))), 1, 1) < '8'
        |       THEN 1L ELSE -1L END AS sgn
        |FROM (SELECT explode(sequence(0, 31)) AS p)
        |LATERAL VIEW explode(sequence(0, 63)) t AS i""".stripMargin)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    for (p <- 0 to 31; i <- 0 to 63) {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p|$i".getBytes("UTF-8"))
      val scalaSign = if (((md(0) >> 4) & 0xf) < 8) 1L else -1L
      assert(scalaSign == sqlSigns((p, i)),
        s"plane sign ($p, $i): driver md5 says $scalaSign, SQL md5 says ${sqlSigns((p, i))}")
    }
  }
}
