package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_probe(shard INT, filter BINARY, hashed_key LONG) -> BOOLEAN` —
  * membership probe against a NON-LITERAL serialized Bloom filter, the
  * primitive Spark's own `BloomFilterMightContain` refuses (it requires
  * the filter side to be a literal or scalar subquery, i.e. ONE filter
  * per query). This is what makes a SHARDED filter table joinable: each
  * probe row carries its shard's filter bytes from the join, and the
  * expression deserializes a shard's filter ONCE per task, not once per
  * row — the cache is keyed by the cheap `shard` int (binary rows from a
  * join are fresh copies per row, so identity-caching the bytes would
  * thrash; content-hashing 100 MB sketches per row would be worse).
  * Shard-partitioned probes see only their own shard(s), so the
  * per-task map holds shards-per-task entries, each deserialized once.
  *
  * `hashed_key` must be the SAME 64-bit hash the build side aggregated
  * (BloomFilterAggregate puts `xxhash64(key)`); see
  * [[BloomCols.probeSharded]], which wires the hash for you.
  *
  * Cache-hit staleness: the cache entry carries the cached payload's
  * length plus a 16-byte sample folded to a long; a probe whose bytes
  * disagree on either re-deserializes. This keeps the expression safe as
  * a GENERAL primitive when a shard key maps to more than one filter
  * version in the joined table (e.g. a per-micro-batch filter stream) —
  * same-length versions differing only outside the 16 sampled positions
  * could still alias, so a stream that needs hard versioning should fold
  * a version counter into the shard key itself.
  */
case class BloomProbeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  // per-task-instance cache: expression objects are serialized per task,
  // so this map is task-local and bounded by shard-versions-per-task
  @transient private lazy val cache =
    new java.util.HashMap[Int, BloomProbeExpr.CachedFilter]()

  /** Deserialize-once-per-shard probe; called from eval AND codegen.
    * A hit is re-validated against the payload length plus a 16-byte
    * sample so a second filter VERSION under the same shard key (join
    * rows are fresh byte copies, identity is useless) cannot silently
    * ride the first version's deserialized sketch.
    */
  def probe(shard: Int, bytes: Array[Byte], hashedKey: Long): Boolean = {
    val sig = BloomProbeExpr.sample(bytes)
    var c = cache.get(shard)
    if (c == null || c.len != bytes.length || c.sig != sig) {
      c = new BloomProbeExpr.CachedFilter(bytes.length, sig,
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
      cache.put(shard, c)
    }
    c.filter.mightContainLong(hashedKey)
  }

  override protected def nullSafeEval(shard: Any, bytes: Any, key: Any): Any =
    probe(shard.asInstanceOf[Int], bytes.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomProbeExpr].getName)
    defineCodeGen(ctx, ev, (s, b, k) => s"$ref.probe($s, $b, $k)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomProbeExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BloomProbeExpr {
  private[graft] final class CachedFilter(
      val len: Int, val sig: Long, val filter: BloomFilter)

  /** Fold 16 positions spread across the payload into a long — a cheap
    * per-row staleness fingerprint (vs hashing a ~100 MB sketch per row).
    */
  private[graft] def sample(b: Array[Byte]): Long = {
    val n = b.length
    if (n == 0) return 0L
    var acc = 0L
    var i = 0
    while (i < 16) {
      // 16 evenly-spread offsets incl. first and last byte
      val pos = ((n - 1).toLong * i / 15).toInt
      acc = acc * 31 + (b(pos) & 0xff)
      i += 1
    }
    acc
  }
}
