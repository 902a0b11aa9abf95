package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.graft.{ArrayDotProduct, Fnv64aExpr, KplDeaggregateExpr, MinhashSignatureExpr}

/** SparkSessionExtensions entry point: enables the engine's native
  * expressions cluster-wide with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver-side
  * `registerAll` call needed. (The UDF/UDAF surface — kpl_aggregate,
  * simhash64, … — still registers per-session via
  * [[graft.functions.GraftFunctions.registerAll]], since UDF registration
  * requires a live session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.1.2", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv64a"),
      info("fnv64a", "fnv64a(expr) - FNV-64a hash of a binary/string column."),
      (exprs: Seq[Expression]) => Fnv64aExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - inner product of double arrays."),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(hashes, k) - k-permutation MinHash."),
      (exprs: Seq[Expression]) =>
        MinhashSignatureExpr(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("kpl_deaggregate_rows"),
      info("kpl_deaggregate_rows", "kpl_deaggregate_rows(data) - explode a KPL aggregate."),
      (exprs: Seq[Expression]) => KplDeaggregateExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of double arrays."),
      (exprs: Seq[Expression]) => {
        val (a, b) = (exprs(0), exprs(1))
        Divide(ArrayDotProduct(a, b),
          Multiply(Sqrt(ArrayDotProduct(a, a)), Sqrt(ArrayDotProduct(b, b))))
      }))
  }
}
