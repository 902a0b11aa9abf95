package graft.operators

import graft.{SparkSpec, SparkSuite}

/** Measures the ANN scale paths against the exact brute-force baseline —
  * the evaluation a user of approximate search needs before trusting it. */
class AnnRecallSpec extends SparkSuite {

  private def topk(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    rows.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("IVF and LSH candidates are well-formed and overlap the exact top-5") {
    val brute = topk(LlmOps.hAnnBrute(spark, SparkSpec.sf0001).collect())
    val ivf = topk(LlmOps.hAnnIvf(spark, SparkSpec.sf0001).collect())
    val lsh = topk(LlmOps.hAnnLsh(spark, SparkSpec.sf0001).collect())

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = brute.keys.toSeq.map { q =>
        val a = approx.getOrElse(q, Set.empty)
        if (a.isEmpty) 0.0 else a.count(brute(q).contains).toDouble / math.min(3, brute(q).size)
      }
      per.sum / per.size
    }
    val rIvf = recall(ivf)
    val rLsh = recall(lsh)
    info(f"recall@3 vs exact top-5: ivf=$rIvf%.2f lsh=$rLsh%.2f")
    // structural guarantees (hard): ranks contiguous, no self-matches
    Seq(ivf, lsh).foreach { m =>
      m.foreach { case (q, ns) => assert(!ns.contains(q)) }
    }
    // recall gate: both scale paths must keep >= 0.9 of the exact top-k
    // (LSH gets there via 3-bucket multi-probe; deterministic planes, so a
    // regression here is a code change, not noise)
    assert(rIvf >= 0.9, f"IVF recall $rIvf%.2f below 0.9 gate")
    assert(rLsh >= 0.9, f"LSH recall $rLsh%.2f below 0.9 gate")
  }

  test("banded-LSH near-dup equals the exact all-pairs join (recall yardstick)") {
    // the oracle-checked query is the bucketed plan; this spec keeps the
    // O(n²) exact join as the ground truth it must reproduce
    val lsh = LlmOps.hNeardupEmbedding(spark, SparkSpec.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = spark.sql(
      """WITH base AS (
        |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |pert AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    transform(v, (x, i) -> x * CASE WHEN (i + 1) % 2 = 0 THEN CAST(1.02 AS DOUBLE) ELSE CAST(0.98 AS DOUBLE) END) AS v
        |  FROM base),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        |normed AS (SELECT vec_id, v, sqrt(dot_product(v, v)) AS nrm FROM corpus)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
        |FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        |WHERE dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.9""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == brute,
      s"LSH-banded result diverged from exact: missing=${(brute -- lsh).take(3)} extra=${(lsh -- brute).take(3)}")
    assert(brute.nonEmpty, "yardstick found no planted near-dups — corpus construction broke")
  }

  test("banded-LSH near-dup plan contains no nested-loop or cartesian join") {
    val plan = LlmOps.hNeardupEmbedding(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"similarity join fell back to an O(n²) physical plan:\n$plan")
  }
}
