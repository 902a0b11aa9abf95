package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Data-governance operators for the curation pipeline (round 10, second
  * half): the release-gate checks a training-data platform runs BEFORE a
  * corpus ships — k-anonymity profiling of quasi-identifier groups,
  * exact-integer distribution-drift measurement between corpus
  * generations, and blocked edit-distance fuzzy matching (the
  * low-tech complement to MinHash for short fields like titles).
  *
  * Scale posture (100 TB):
  *  - k-anonymity is two hash aggregates: (lang, source, bucket) group
  *    sizes with map-side partials, then a per-lang rollup of the group
  *    table — the second input is group-cardinality-sized, never
  *    corpus-sized.
  *  - Drift compares per-(lang, bucket) histograms of two generations.
  *    Each histogram is one aggregation of its generation; the compare
  *    joins histogram-sized tables. Total-variation distance is kept in
  *    EXACT BIGINT arithmetic (|n1·N2 − n2·N1| summed, then one integer
  *    division) so both engines agree bit-for-bit — no float probability
  *    ever materializes.
  *  - Fuzzy match generates candidates ONLY within (lang, first-token,
  *    length-bucket) blocks — an equi-join, so pair volume scales with
  *    Σ block² not corpus², and the quadratic term is bounded by the
  *    largest block (the standard blocking argument; skewed blocks are
  *    AQE skew-join territory). Levenshtein runs on 32-char prefixes,
  *    codegen'd, scan-local after the join.
  */
object GovernanceOps {

  private def docs(s: SparkSession, dir: String): Unit =
    Tables.load(s, dir, "documents").createOrReplaceTempView("documents")

  // ======================================================== k-anonymity

  /** k-anonymity profile over the quasi-identifier (lang, source,
    * 128-char length bucket) at k=5 — the suppression accounting a
    * privacy review asks for: how many QI groups are too small to
    * release, how many documents they strand, and the k actually
    * achieved by the surviving groups. */
  def hKAnonymity(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
    s.sql(kAnonymityBody("DIV"))
  }

  private def kAnonymityBody(div: String): String =
    s"""WITH g AS (
      |  SELECT lang, source, n_chars $div 128 AS len_bucket, count(*) AS n
      |  FROM documents GROUP BY lang, source, n_chars $div 128)
      |SELECT lang,
      |  count(*) AS n_groups,
      |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS suppressed_groups,
      |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS suppressed_docs,
      |  CAST(sum(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT) AS kept_docs,
      |  CAST(coalesce(min(CASE WHEN n >= 5 THEN n END), 0) AS BIGINT) AS k_achieved
      |FROM g GROUP BY lang ORDER BY lang""".stripMargin

  val hKAnonymitySql: String = kAnonymityBody("//")

  // ================================================== distribution drift

  /** Distribution drift between two corpus generations — the monitoring
    * check a recurring crawl runs to catch a changed upstream: per-lang
    * total-variation distance between the 64-char length-bucket
    * histograms of v1 (the corpus) and v2 (the same deterministic
    * derivation h_corpus_diff uses: every 11th doc dropped, every 7th
    * mutated by the first-word strip, every 13th replayed as new).
    *
    * TVD = ½ Σ_b |n1_b/N1 − n2_b/N2| is computed as the exact integer
    * Σ|n1·N2 − n2·N1| and reported in millis via one integer division —
    * partitioning-independent, bit-identical cross-engine. */
  def hDistDrift(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
    s.sql(distDriftBody("DIV", "'^\\\\S+\\\\s+'"))
  }

  private def distDriftBody(div: String, stripRe: String): String =
    s"""WITH v1 AS (SELECT lang, length(text) $div 64 AS b FROM documents),
      |v2 AS (
      |  SELECT lang, length(CASE WHEN doc_id % 7 = 0
      |    THEN regexp_replace(text, $stripRe, '') ELSE text END) $div 64 AS b
      |  FROM documents WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT lang, length(concat('new ', text)) $div 64 AS b
      |  FROM documents WHERE doc_id % 13 = 0),
      |c1 AS (SELECT lang, b, count(*) AS n FROM v1 GROUP BY lang, b),
      |c2 AS (SELECT lang, b, count(*) AS n FROM v2 GROUP BY lang, b),
      |j AS (
      |  SELECT coalesce(c1.lang, c2.lang) AS lang,
      |    coalesce(c1.n, 0) AS n1, coalesce(c2.n, 0) AS n2
      |  FROM c1 FULL OUTER JOIN c2 ON c1.lang = c2.lang AND c1.b = c2.b),
      |w AS (
      |  SELECT lang, n1, n2,
      |    CAST(sum(n1) OVER (PARTITION BY lang) AS BIGINT) AS na,
      |    CAST(sum(n2) OVER (PARTITION BY lang) AS BIGINT) AS nb
      |  FROM j)
      |SELECT lang, min(na) AS n_v1, min(nb) AS n_v2,
      |  count(*) AS n_buckets,
      |  CAST(sum(abs(n1 * nb - n2 * na)) AS BIGINT) AS tvd_num,
      |  CAST(sum(abs(n1 * nb - n2 * na)) * 500 $div (min(na) * min(nb)) AS BIGINT) AS tvd_millis
      |FROM w GROUP BY lang ORDER BY lang""".stripMargin

  val hDistDriftSql: String = distDriftBody("//", raw"'^\S+\s+'")

  // ====================================================== fuzzy matching

  /** Blocked fuzzy matching on 32-char document prefixes ("titles"):
    * candidate pairs share (lang, first token, 64-char total-length
    * bucket) — an equi-join block key — and are scored by Levenshtein
    * edit distance, the near-dup signal for SHORT fields where MinHash
    * shingles are degenerate. Reports per-lang candidate volume, exact
    * collisions (d=0), fuzzy matches (1 ≤ d ≤ 5), and the summed
    * distance of the fuzzy band. */
  def hFuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
    s.sql(fuzzyBody("DIV"))
  }

  private def fuzzyBody(div: String): String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, substring(text, 1, 32) AS title,
      |    split_part(text, ' ', 1) AS w0, length(text) $div 64 AS lb
      |  FROM documents),
      |p AS (
      |  SELECT a.lang AS lang, levenshtein(a.title, b.title) AS d
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.w0 = b.w0 AND a.lb = b.lb
      |    AND a.doc_id < b.doc_id)
      |SELECT lang, count(*) AS n_candidates,
      |  CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
      |  CAST(sum(CASE WHEN d BETWEEN 1 AND 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_fuzzy,
      |  CAST(sum(CASE WHEN d BETWEEN 1 AND 5 THEN d ELSE 0 END) AS BIGINT) AS sum_dist
      |FROM p GROUP BY lang ORDER BY lang""".stripMargin

  val hFuzzyMatchSql: String = fuzzyBody("//")

  // ============================================================ DP release

  /** Differentially-private AGGREGATE RELEASE mechanics — the noised
    * statistics table a corpus platform publishes when exact per-group
    * counts are themselves sensitive (the k-anonymity report's
    * complement: suppress small groups there, noise the released numbers
    * here), with the ε ledger a privacy review audits. Per (lang,
    * metric ∈ {docs, tokens}): the true value, a symmetric-geometric
    * noise draw (the discrete-Laplace family at scale b = 1/ln 2 ⇒
    * ε = ln 2 per release), the clamped released value, and the
    * sequential-composition ledger (two releases per lang ⇒ 2·ln 2
    * spent). The noise is DETERMINISTIC-BY-DRAW so the release is
    * reproducible and cross-engine exact: the draw is the first 24 md5
    * bits of (metric | lang); the magnitude is the draw's TRAILING-ZERO
    * count (a uniform integer's trailing zeros are exactly
    * Geometric(½): P(k) = 2^(−k−1), capped at 20 by OR-ing bit 20 in),
    * the sign is draw bit 21 — giving P(0) = ½, P(±k) = 2^(−k−2), the
    * two-sided geometric ratio-½ ladder (spec-pinned by exhaustive
    * enumeration). A production system swaps the md5 draw for a real
    * RNG; every other number in the release is unchanged.
    *
    * Scale shape: one scan collapses to |langs|×2 rows; everything after
    * is control-plane algebra on that dimension-sized table. */
  def hDpRelease(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
    s.sql(dpReleaseBody(
      div = "DIV",
      draw = "CAST(conv(substring(md5(concat(metric, '|', lang)), 1, 6), 16, 10) AS BIGINT)",
      ntoks = "size(split(text, ' '))"))
  }

  private def dpReleaseBody(div: String, draw: String, ntoks: String): String =
    s"""WITH m AS (
      |  SELECT lang, 'docs' AS metric, CAST(count(*) AS BIGINT) AS true_value
      |  FROM documents GROUP BY lang
      |  UNION ALL
      |  SELECT lang, 'tokens' AS metric, CAST(sum($ntoks) AS BIGINT) AS true_value
      |  FROM documents GROUP BY lang),
      |d AS (
      |  SELECT lang, metric, true_value, $draw AS draw FROM m),
      |n AS (
      |  SELECT lang, metric, true_value,
      |    (CASE WHEN (draw >> 21) & 1 = 1 THEN 1 ELSE -1 END)
      |      * (length(bin((draw | 1048576) & -(draw | 1048576))) - 1) AS noise
      |  FROM d)
      |SELECT lang, metric, true_value,
      |  CAST(noise AS BIGINT) AS noise,
      |  CAST(greatest(0, true_value + noise) AS BIGINT) AS released,
      |  CAST(abs(greatest(0, true_value + noise) - true_value) AS BIGINT) AS abs_err,
      |  CAST(1 AS BIGINT) AS eps_ln2_units,
      |  CAST(2 AS BIGINT) AS lang_total_eps_ln2
      |FROM n ORDER BY lang, metric""".stripMargin

  /** DuckDB twin: identical draw, trailing-zeros noise and ledger. */
  val hDpReleaseSql: String = dpReleaseBody(
    div = "//",
    draw = "CAST(concat('0x', substring(md5(concat(metric, '|', lang)), 1, 6)) AS BIGINT)",
    ntoks = "len(string_split(text, ' '))")

  // ================================================================ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h_k_anonymity" -> (hKAnonymity _),
    "h_dist_drift" -> (hDistDrift _),
    "h_fuzzy_match" -> (hFuzzyMatch _),
    "h_dp_release" -> (hDpRelease _)
  )

  def oracleSql: Map[String, String] = Map(
    "h_k_anonymity" -> hKAnonymitySql,
    "h_dist_drift" -> hDistDriftSql,
    "h_fuzzy_match" -> hFuzzyMatchSql,
    "h_dp_release" -> hDpReleaseSql
  )
}
