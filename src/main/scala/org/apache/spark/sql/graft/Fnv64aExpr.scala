package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String

import graft.kernel.Fnv64a

/** `fnv64a(binary|string) -> bigint` — the engine's record-identity hash
  * (reference: pkg/deduper/deduper.go:26-29, pkg/aggregator/aggregator.go:25-31),
  * as a native Catalyst expression so it participates in whole-stage codegen
  * on the dedup/partitioning hot path (a Scala UDF here would break the
  * codegen span on every 100 TB scan that computes record identity).
  */
case class Fnv64aExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(TypeCollection(BinaryType, StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "fnv64a"

  override protected def nullSafeEval(input: Any): Any = input match {
    case b: Array[Byte] => Fnv64a.hash(b)
    case s: UTF8String  => Fnv64a.hash(s.getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conv: String => String = child.dataType match {
      case BinaryType => c => s"graft.kernel.Fnv64a.hash($c)"
      case _          => c => s"graft.kernel.Fnv64a.hash($c.getBytes())"
    }
    defineCodeGen(ctx, ev, conv)
  }

  override protected def withNewChildInternal(newChild: Expression): Fnv64aExpr =
    copy(child = newChild)
}
