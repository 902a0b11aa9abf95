package graft.operators

import graft.{SparkSpec, SparkSuite}
import graft.kernel.SimHash

class LlmOpsSpec extends SparkSuite {

  test("h_ann_lsh emits one planted-pair summary row per query") {
    // columns: q_id, planted_id, found, top1_id, top1_cosine
    val rows = LlmOps.hAnnLsh(spark, SparkSpec.sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per query")
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 1000000L, "planted id derives from q_id")
      assert(r.getDouble(4) >= -1.0 && r.getDouble(4) <= 1.0)
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

  test("multimodal frames byte/char stride equivalence: corpus must be ASCII") {
    // hMultimodalFrames strides UTF-8 bytes; its DuckDB oracle strides
    // characters (BLOBs aren't substring-able in DuckDB 1.0). The two agree
    // iff the corpus is ASCII — pin that assumption so a corpus change
    // surfaces here instead of as an opaque hash mismatch.
    import org.apache.spark.sql.functions.expr
    val nonAscii = graft.Tables.load(spark, SparkSpec.sf0001, "documents")
      .filter(expr("octet_length(text) <> char_length(text)")).count()
    assert(nonAscii == 0L, s"$nonAscii non-ASCII docs break the byte-vs-char stride oracle")
  }

  test("multimodal decode stub is deterministic and total") {
    val r = Multimodal.decodeStub(7L, "abcd".getBytes("UTF-8"))
    assert(r.width === ('a'.toInt * 7) % 512 + 1)
    assert(r.format === (('d'.toInt % 3) match { case 0 => "png"; case 1 => "jpg"; case _ => "webp" }))
    val empty = Multimodal.decodeStub(8L, Array.emptyByteArray)
    assert(empty.width === 1 && empty.n_bytes === 0L)
  }
}
