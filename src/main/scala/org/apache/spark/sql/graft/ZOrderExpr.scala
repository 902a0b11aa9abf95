package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** `zorder2(x, y) -> bigint` — Morton interleave of the low 16 bits of two
  * cell coordinates ([[graft.kernel.ZOrder.interleave16]]). Generated code
  * is a single static call, fully inside whole-stage codegen, so deriving
  * the clustering key costs the same as any arithmetic projection on the
  * scan — no shuffle, no sort, no UDF boundary.
  */
case class ZOrder2Expr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.kernel.ZOrder.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.kernel.ZOrder.interleave16($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder2Expr =
    copy(left = newLeft, right = newRight)
}
