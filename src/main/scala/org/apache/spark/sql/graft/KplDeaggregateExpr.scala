package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.kernel.KplProtobuf

/** `kpl_deaggregate_rows(binary)` — a Catalyst [[Generator]]: one framed
  * KPL aggregate explodes directly to its N user-record rows
  * (data BINARY, partition_key STRING), without materializing an
  * intermediate array the way the UDF+explode formulation does (SURVEY §7:
  * "kpl_deaggregate as a Generator"). Non-aggregated payloads (oversize
  * bypass) yield a single row with a null key; null input yields no rows.
  * CodegenFallback: the per-row work is one codec call that dominates any
  * virtual-call overhead (entries are ~25 kB).
  */
case class KplDeaggregateExpr(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def prettyName: String = "kpl_deaggregate_rows"

  override def elementSchema: StructType = StructType(Seq(
    StructField("data", BinaryType, nullable = false),
    StructField("partition_key", StringType, nullable = true),
    StructField("explicit_hash_key", StringType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input).asInstanceOf[Array[Byte]]
    if (raw == null) Iterator.empty
    else if (KplProtobuf.isAggregated(raw)) {
      val agg = KplProtobuf.decodeFramed(raw) // isAggregated already verified MD5
      agg.records.iterator.map { r =>
        InternalRow(
          r.data,
          UTF8String.fromString(agg.partitionKeys(r.partitionKeyIndex.toInt)),
          r.explicitHashKeyIndex
            .map(i => UTF8String.fromString(agg.explicitHashKeys(i.toInt))).orNull)
      }
    } else Iterator.single(InternalRow(raw, null, null))
  }

  override protected def withNewChildInternal(newChild: Expression): KplDeaggregateExpr =
    copy(child = newChild)
}
