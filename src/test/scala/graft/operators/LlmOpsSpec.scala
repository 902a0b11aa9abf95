package graft.operators

import graft.{SparkSpec, SparkSuite}
import graft.kernel.SimHash

class LlmOpsSpec extends SparkSuite {

  test("h_ann_lsh (rows-only path) returns ranked neighbors per query") {
    val rows = LlmOps.hAnnLsh(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(3).toInt).toSeq
      assert(ranks == (1 to ranks.max))
      // ranked by rounded cosine descending
      val cosines = rs.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("LSH bucket recall: perturbed twin shares its original's top spot in brute force") {
    // the oracle-matched brute query must rank a vector's ±2% twin first
    // when present; spot-check the machinery end-to-end via hNeardupEmbedding
    val pairs = LlmOps.hNeardupEmbedding(spark, SparkSpec.sf0001).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 1000000L))
    assert(pairs.forall(_.getDouble(2) >= 0.99))
  }

  test("simhash hamming distance: mutated doc stays within small radius") {
    val base = "the quick brown fox jumps over the lazy dog again and again".split(" ")
    val mutated = base.drop(1)
    val d = SimHash.hamming(SimHash.simhash64(base.toSeq), SimHash.simhash64(mutated.toSeq))
    assert(d <= 16, s"hamming $d")
    assert(SimHash.hamming(SimHash.simhash64(base.toSeq), SimHash.simhash64(base.toSeq)) === 0)
  }

  test("multimodal frame sampler: stride windows cover the payload") {
    val content = Array.tabulate(100)(_.toByte)
    val frames = Multimodal.frameSampleStub(content, 32)
    assert(frames.length === 4)
    assert(frames.head.length === 16)
    assert(frames.head(0) === 0.toByte && frames(1)(0) === 32.toByte)
  }

  test("multimodal decode stub is deterministic and total") {
    val r = Multimodal.decodeStub(7L, "abcd".getBytes("UTF-8"))
    assert(r.width === ('a'.toInt * 7) % 512 + 1)
    assert(r.format === (('d'.toInt % 3) match { case 0 => "png"; case 1 => "jpg"; case _ => "webp" }))
    val empty = Multimodal.decodeStub(8L, Array.emptyByteArray)
    assert(empty.width === 1 && empty.n_bytes === 0L)
  }
}
