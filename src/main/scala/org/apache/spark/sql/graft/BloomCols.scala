package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.types.BinaryType

/** Column builders over Spark's native Bloom-filter expressions — the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair the optimizer's
  * runtime-filter injection uses, exposed for explicit semi-join reduction
  * with the filter's selectivity under caller control.
  *
  * Why not a Scala UDF over `stat.bloomFilter`: the UDF probe is a codegen
  * barrier on the fact-side scan — exactly the hot path the Bloom filter
  * exists to thin. `BloomFilterMightContain` has `doGenCode`, so the probe
  * stays inside WholeStageCodegen.
  */
object BloomCols {

  /** Distributed Bloom-filter build: aggregate `key` (hashed to 64 bits,
    * as the probe side expects) into a serialized filter. Runs as a
    * partial-then-merge TypedImperativeAggregate — no key ever reaches the
    * driver; only the ~numBits/8-byte sketch does. */
  def bloomFilterAgg(key: Column, estimatedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key))),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Codegen'd membership probe against a serialized filter literal. The
    * key is hashed exactly as [[bloomFilterAgg]] hashed it at build time. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      new XxHash64(Seq(Bridge.expression(key)))))

  /** Codegen'd probe against a NON-LITERAL filter column from a sharded
    * filter-table join — deserialized once per shard per task (see
    * [[BloomProbeExpr]]). Key hashing matches [[bloomFilterAgg]]. */
  def probeSharded(shard: Column, filterBytes: Column, key: Column): Column =
    Bridge.column(BloomProbeExpr(
      Bridge.expression(shard), Bridge.expression(filterBytes),
      new XxHash64(Seq(Bridge.expression(key)))))
}
