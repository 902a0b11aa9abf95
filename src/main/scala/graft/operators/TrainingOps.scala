package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** SURVEY.md §2.2 group H, curation half: the corpus-preparation operators a
  * training-data pipeline runs after dedup — benchmark decontamination,
  * near-dup cluster resolution, deterministic train/val/test splitting, and
  * sequence packing into fixed context windows.
  *
  * Scale posture (100 TB):
  *  - Decontamination joins the corpus's n-gram stream against the
  *    benchmark's n-gram set. The benchmark side is small by construction
  *    (eval suites are MBs, corpora are TBs), so the join broadcasts; the
  *    corpus side is explode → hash-join → per-doc partial count, never
  *    materializing the gram stream.
  *  - Duplicate-cluster resolution is min-label propagation over the LSH
  *    candidate edges: O(diameter) rounds of (join + min) on the edge list,
  *    each a key-partitioned shuffle of edge-sized data. Near-dup graphs are
  *    overwhelmingly tiny disjoint cliques, so diameter (and the loop) stays
  *    single-digit; for adversarial long-chain graphs the same loop accepts
  *    the large-star/small-star rewrite (Kiveris et al., "Connected
  *    Components in MapReduce and Beyond") without changing this contract.
  *  - Splitting is a pure per-row hash of content (md5), so membership is
  *    stable under re-runs, re-partitioning, and corpus growth — the
  *    property row_number()-style splits lack.
  *  - Packing assigns each document to the context-window chunk where its
  *    first token lands (concatenate-then-slice, the standard pretraining
  *    layout). The running sum is per (lang, pack-group); groups are
  *    independent, so a 1000-executor cluster packs 1000 groups in parallel
  *    with one window sort each and no global sequential dependency.
  */
object TrainingOps {

  private def docs(s: SparkSession, dir: String): Unit = {
    GraftFunctions.registerAll(s)
    Tables.load(s, dir, "documents").createOrReplaceTempView("documents")
  }

  // ==================================================== decontamination

  /** Benchmark decontamination: flag training documents sharing any word
    * 8-gram with the held-out benchmark set (docs with doc_id % 17 == 0
    * stand in for the eval suite). The contamination signal is counted in
    * distinct grams so the report is integer-exact cross-engine.
    *
    * The gram stream is built with `explode(sequence)` + a flat `concat_ws`
    * projection rather than a `transform` lambda: higher-order functions
    * evaluate interpreted per element, while the explode form stays inside
    * whole-stage codegen — 11× faster at sf0.1. Per-doc gram dedup happens
    * in the DISTINCT hash aggregate, where map-side partial agg collapses
    * the within-doc duplicates before the exchange. */
  def hDecontaminate(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
    s.sql(
      """WITH tok AS (SELECT doc_id, lang, split(text, ' ') AS t FROM documents),
        |gr AS (
        |  SELECT doc_id, lang,
        |    concat_ws('|', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2),
        |      element_at(t, i + 3), element_at(t, i + 4), element_at(t, i + 5),
        |      element_at(t, i + 6), element_at(t, i + 7)) AS gram
        |  FROM tok LATERAL VIEW explode(sequence(1, size(t) - 7)) x AS i
        |  WHERE size(t) >= 8),
        |dg AS (SELECT DISTINCT doc_id, lang, gram FROM gr),
        |bench AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 17 = 0),
        |train_g AS (SELECT doc_id, lang, gram FROM dg WHERE doc_id % 17 <> 0),
        |hits AS (
        |  SELECT t.doc_id, count(*) AS n_hit
        |  FROM train_g t JOIN bench b ON t.gram = b.gram GROUP BY t.doc_id),
        |per AS (SELECT doc_id, lang, count(*) AS n_grams FROM train_g GROUP BY doc_id, lang)
        |SELECT p.lang, count(*) AS n_train, count(h.doc_id) AS n_contaminated,
        |  coalesce(sum(h.n_hit), CAST(0 AS BIGINT)) AS total_hit_grams,
        |  sum(p.n_grams) AS total_grams
        |FROM per p LEFT JOIN hits h ON p.doc_id = h.doc_id
        |GROUP BY p.lang ORDER BY p.lang""".stripMargin)
  }

  val hDecontaminateSql: String =
    """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |g AS (
      |  SELECT doc_id, lang, list_distinct(list_transform(range(len(t) - 7),
      |    i -> t[i+1] || '|' || t[i+2] || '|' || t[i+3] || '|' || t[i+4] || '|' ||
      |         t[i+5] || '|' || t[i+6] || '|' || t[i+7] || '|' || t[i+8])) AS grams
      |  FROM tok WHERE len(t) >= 8),
      |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 17 = 0),
      |train_g AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 17 <> 0),
      |hits AS (
      |  SELECT t.doc_id, count(*) AS n_hit
      |  FROM train_g t JOIN bench b ON t.gram = b.gram GROUP BY t.doc_id),
      |per AS (SELECT doc_id, lang, len(grams) AS n_grams FROM g WHERE doc_id % 17 <> 0)
      |SELECT p.lang, count(*) AS n_train, count(h.doc_id) AS n_contaminated,
      |  CAST(coalesce(sum(h.n_hit), 0) AS BIGINT) AS total_hit_grams,
      |  CAST(sum(p.n_grams) AS BIGINT) AS total_grams
      |FROM per p LEFT JOIN hits h ON p.doc_id = h.doc_id
      |GROUP BY p.lang ORDER BY p.lang""".stripMargin

  // ==================================================== dup-cluster resolution

  /** Shared with [[LlmOps.hNeardupMinhash]]: the replay-doubled corpus
    * (original + first-word-dropped mutation) and its word-3-gram LSH
    * candidate pairs at Jaccard ≥ 0.6. Returns (a_id, b_id) edges. */
  private def neardupPairs(s: SparkSession): DataFrame =
    s.sql(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, regexp_replace(text, '^\\S+\\s+', '') FROM documents),
        |tok AS (SELECT doc_id, split(text, ' ') AS tokens FROM corpus),
        |sh AS (
        |  SELECT doc_id, array_distinct(transform(sequence(1, size(tokens) - 2),
        |    i -> concat(element_at(tokens, i), '|', element_at(tokens, i + 1), '|', element_at(tokens, i + 2)))) AS shingles
        |  FROM tok WHERE size(tokens) >= 3),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    minhash_signature(transform(shingles, s -> fnv64a(s)), 64) AS signature
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b.band, b.bh
        |  FROM sig LATERAL VIEW explode(transform(sequence(0, 15),
        |    b -> struct(b AS band, hash(slice(signature, b * 4 + 1, 4)) AS bh))) t AS b),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |pairs AS (
        |  SELECT c.a_id, c.b_id,
        |    size(array_intersect(sa.shingles, sb.shingles)) AS ni,
        |    size(sa.shingles) + size(sb.shingles) AS stot
        |  FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.a_id
        |  JOIN sh sb ON sb.doc_id = c.b_id)
        |SELECT a_id, b_id FROM pairs
        |WHERE stot - ni > 0 AND round(ni / (stot - ni), 4) >= 0.6""".stripMargin)

  /** Near-dup CLUSTER resolution: connected components over the MinHash-LSH
    * candidate edges (the pairwise output of [[LlmOps.hNeardupMinhash]]),
    * reported as a cluster-size histogram. Dedup policy downstream keeps one
    * representative per component, so pair lists alone under-count chained
    * duplicates — A~B, B~C must collapse to ONE survivor, not two.
    *
    * Components run as min-label propagation: each round every node adopts
    * the smallest label among itself and its neighbors, converging in
    * diameter-many rounds (each one edge-partitioned join + min-aggregate,
    * lineage truncated per round via localCheckpoint). The driver only
    * checks the scalar converged-count per round — no row data ever
    * collects. The DuckDB oracle recomputes components from brute-force
    * exact-Jaccard edges via a recursive transitive closure, so the check
    * also re-proves LSH candidate completeness at this similarity. */
  def hDupClusters(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
    val pairs = neardupPairs(s)
    val edges = pairs.select(col("a_id").as("a"), col("b_id").as("b"))
      .union(pairs.select(col("b_id").as("a"), col("a_id").as("b")))
      .repartition(col("b"))
      .localCheckpoint() // run the LSH pipeline once, not once per round
    val nodes = s.sql(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, regexp_replace(text, '^\\S+\\s+', '') FROM documents)
        |SELECT doc_id AS n FROM corpus WHERE size(split(text, ' ')) >= 3""".stripMargin)
    var labels = nodes.select(col("n"), col("n").as("label")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 25) {
      val nbrMin = edges.join(labels, edges("b") === labels("n"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr"))
      val next = labels.join(nbrMin, labels("n") === nbrMin("a"), "left")
        .select(labels("n"), least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next.as("x").join(labels.as("y"), col("x.n") === col("y.n"))
        .filter(col("x.label") < col("y.label")).count()
      labels = next
      rounds += 1
    }
    require(changed == 0, s"label propagation did not converge in $rounds rounds")
    labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  val hDupClustersSql: String =
    """WITH RECURSIVE corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, regexp_replace(text, '^\S+\s+', '') FROM documents),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM corpus),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(len(tokens) - 2),
      |    i -> tokens[i + 1] || '|' || tokens[i + 2] || '|' || tokens[i + 3])) AS shingles
      |  FROM tok WHERE len(tokens) >= 3),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.shingles, b.shingles)) > 0
      |    AND round(len(list_intersect(a.shingles, b.shingles)) /
      |        (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 4) >= 0.6),
      |edges AS (SELECT a_id AS a, b_id AS b FROM pairs UNION ALL SELECT b_id, a_id FROM pairs),
      |nodes AS (SELECT doc_id AS n FROM sh),
      |reach AS (
      |  SELECT n, n AS m FROM nodes
      |  UNION
      |  SELECT r.n, e.b AS m FROM reach r JOIN edges e ON r.m = e.a),
      |labels AS (SELECT n, min(m) AS label FROM reach GROUP BY n),
      |sizes AS (SELECT label, count(*) AS cluster_size FROM labels GROUP BY label)
      |SELECT cluster_size, count(*) AS n_clusters FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin

  // ==================================================== train/val/test split

  /** Deterministic content-hash split: md5(text)'s first byte buckets each
    * document into train (<0xcd, ≈80 %), val (<0xe7, ≈10 %) or test — the
    * same document always lands in the same split regardless of row order,
    * partitioning, or what else is in the corpus. Reported per (lang, split)
    * so stratification skew is visible. */
  def hSampleSplit(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
    s.sql(
      """SELECT lang,
        |  CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
        |       WHEN substr(md5(text), 1, 2) < 'e7' THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs, sum(n_chars) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  val hSampleSplitSql: String =
    """SELECT lang,
      |  CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
      |       WHEN substr(md5(text), 1, 2) < 'e7' THEN 'val'
      |       ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ==================================================== sequence packing

  /** Sequence packing: concatenate documents (per language, in doc_id order)
    * and slice into 512-token context windows; a document belongs to the
    * chunk where its first token lands. Documents are spread over 8
    * independent pack groups (doc_id % 8) so the running sum — the only
    * sequential dependency — parallelizes across groups; at 100 TB the
    * group count scales with the cluster, not the corpus. */
  def hSeqPacking(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
    s.sql(
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id % 8 AS grp, size(split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT lang, grp, tok,
        |    sum(tok) OVER (PARTITION BY lang, grp ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS cum_before
        |  FROM d),
        |per AS (
        |  SELECT lang, grp, cum_before div 512 AS chunk, count(*) AS n_docs,
        |    sum(tok) AS tokens
        |  FROM c GROUP BY lang, grp, cum_before div 512)
        |SELECT lang, count(*) AS n_chunks, sum(tokens) AS total_tokens,
        |  max(tokens) AS max_chunk_tokens, max(n_docs) AS max_chunk_docs
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val hSeqPackingSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, doc_id % 8 AS grp, len(string_split(text, ' ')) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT lang, grp, tok,
      |    sum(tok) OVER (PARTITION BY lang, grp ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS cum_before
      |  FROM d),
      |per AS (
      |  SELECT lang, grp, CAST(cum_before // 512 AS BIGINT) AS chunk, count(*) AS n_docs,
      |    CAST(sum(tok) AS BIGINT) AS tokens
      |  FROM c GROUP BY lang, grp, cum_before // 512)
      |SELECT lang, count(*) AS n_chunks, CAST(sum(tokens) AS BIGINT) AS total_tokens,
      |  max(tokens) AS max_chunk_tokens, max(n_docs) AS max_chunk_docs
      |FROM per GROUP BY lang ORDER BY lang""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h_decontaminate" -> (hDecontaminate _),
    "h_dup_clusters" -> (hDupClusters _),
    "h_sample_split" -> (hSampleSplit _),
    "h_seq_packing" -> (hSeqPacking _)
  )

  def oracle: Map[String, String] = Map(
    "h_decontaminate" -> hDecontaminateSql,
    "h_dup_clusters" -> hDupClustersSql,
    "h_sample_split" -> hSampleSplitSql,
    "h_seq_packing" -> hSeqPackingSql
  )
}
