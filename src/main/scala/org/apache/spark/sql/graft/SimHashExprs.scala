package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}

import graft.kernel.Fnv64a

/** `simhash64(array<string>) -> bigint` — 64-bit Charikar SimHash
  * fingerprint of a token array, as a native Catalyst expression so the
  * per-document fingerprint pass stays inside whole-stage codegen (this
  * ran as a Scala UDF through round 16 — the last non-codec UDF on a
  * declared-query path, `h_simhash_dedup` — where every row paid the
  * UDF boundary: catalyst→Scala `Seq[String]` conversion plus a broken
  * codegen span on a 100 TB fingerprint scan).
  *
  * Semantics are pinned BYTE-IDENTICAL to [[graft.kernel.SimHash]] (the
  * deliberately Spark-free kernel used by unit tests and non-SQL
  * callers): SimHashExprSpec asserts expression == kernel over generated
  * token arrays. The voting loop here runs directly over Tungsten
  * `ArrayData`/`UTF8String` with zero per-token JVM String allocation.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expr.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.SimHash64Expr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  /** The kernel's voting loop (graft.kernel.SimHash.simhash64) over
    * ArrayData: each token's FNV-64a hash votes ±1 per bit position; the
    * fingerprint takes the sign. Null tokens abstain (split() never
    * produces them; an explicit NULL element must not NPE a whole scan). */
  def hash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = Fnv64a.hash(arr.getUTF8String(j).getBytes)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var res = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) res |= (1L << i)
      i += 1
    }
    res
  }
}

/** `hamming64(bigint, bigint) -> int` — Hamming distance between two
  * 64-bit fingerprints (popcount of XOR), codegen'd to a single
  * `Long.bitCount` intrinsic. Companion of [[SimHash64Expr]] on the
  * near-dup candidate-verify path. */
case class Hamming64Expr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64Expr =
    copy(left = newLeft, right = newRight)
}
