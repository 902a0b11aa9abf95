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
    // statistical guarantee (soft floor): approximate search must beat
    // random chance by a wide margin on 500 vectors (random ~ 3/500)
    assert(rIvf > 0.1, f"IVF recall $rIvf%.2f suspiciously low")
    assert(rLsh > 0.1, f"LSH recall $rLsh%.2f suspiciously low")
  }
}
