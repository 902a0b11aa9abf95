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
  */
case class BloomProbeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  // per-task-instance cache: expression objects are serialized per task,
  // so this map is task-local and bounded by shards-per-task
  @transient private lazy val cache =
    new java.util.HashMap[Int, BloomFilter]()

  /** Deserialize-once-per-shard probe; called from eval AND codegen. */
  def probe(shard: Int, bytes: Array[Byte], hashedKey: Long): Boolean = {
    var f = cache.get(shard)
    if (f == null) {
      f = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      cache.put(shard, f)
    }
    f.mightContainLong(hashedKey)
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
