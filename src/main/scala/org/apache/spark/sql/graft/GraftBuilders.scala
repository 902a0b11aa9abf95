package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, Multiply, Sqrt}

/** Single source of truth for the engine's expression builders — shared by
  * the session-level registry (GraftFunctions.registerAll) and the
  * cluster-level extension (graft.GraftExtensions), so both SQL entry
  * points always resolve a name to the identical expression tree.
  */
object GraftBuilders {

  /** Plan-time literal-Int argument: demands foldability and numeric type so
    * a bad call site (non-literal, NULL, wrong arity) fails with a message
    * naming the function instead of an opaque ClassCastException/NPE. */
  private def litInt(fn: String, exprs: Seq[Expression], idx: Int, arity: Int): Int = {
    require(exprs.length == arity,
      s"$fn expects $arity arguments, got ${exprs.length}")
    val e = exprs(idx)
    require(e.foldable, s"$fn argument ${idx + 1} must be a literal integer, got: $e")
    e.eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new IllegalArgumentException(
          s"$fn argument ${idx + 1} must be a non-null integer literal, got: $other")
    }
  }

  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("fnv64a",
      exprs => { val Seq(v) = exprs; Fnv64aExpr(v) },
      "fnv64a(expr) - FNV-64a hash of a binary/string column."),
    ("dot_product",
      exprs => ArrayDotProduct(exprs(0), exprs(1)),
      "dot_product(a, b) - inner product of double arrays."),
    ("minhash_signature",
      exprs => MinhashSignatureExpr(exprs(0), litInt("minhash_signature", exprs, 1, 2)),
      "minhash_signature(hashes, k) - k-permutation MinHash signature."),
    ("kpl_deaggregate_rows",
      exprs => { val Seq(v) = exprs; KplDeaggregateExpr(v) },
      "kpl_deaggregate_rows(data) - explode a KPL aggregate into user records."),
    ("hyperplane_bands",
      exprs => HyperplaneBandsExpr(exprs(0),
        litInt("hyperplane_bands", exprs, 1, 3), litInt("hyperplane_bands", exprs, 2, 3)),
      "hyperplane_bands(v, nBands, bandBits) - banded sign-LSH keys."),
    ("hyperplane_probes",
      exprs => HyperplaneProbesExpr(exprs(0),
        litInt("hyperplane_probes", exprs, 1, 3), litInt("hyperplane_probes", exprs, 2, 3)),
      "hyperplane_probes(v, bandBits, nProbes) - multi-probe LSH buckets."),
    ("cosine_sim",
      exprs => {
        val (a, b) = (exprs(0), exprs(1))
        Divide(ArrayDotProduct(a, b),
          Multiply(Sqrt(ArrayDotProduct(a, a)), Sqrt(ArrayDotProduct(b, b))))
      },
      "cosine_sim(a, b) - cosine similarity of double arrays."),
    ("zorder2",
      exprs => {
        require(exprs.length == 2, s"zorder2 expects 2 arguments, got ${exprs.length}")
        ZOrder2Expr(exprs(0), exprs(1))
      },
      "zorder2(x, y) - Morton interleave of two 16-bit cell coordinates."),
    ("simhash64",
      exprs => { val Seq(v) = exprs; SimHash64Expr(v) },
      "simhash64(tokens) - 64-bit Charikar SimHash fingerprint of a token array."),
    ("hamming64",
      exprs => {
        require(exprs.length == 2, s"hamming64 expects 2 arguments, got ${exprs.length}")
        Hamming64Expr(exprs(0), exprs(1))
      },
      "hamming64(a, b) - Hamming distance between two 64-bit fingerprints."),
    ("int8_quant_stats",
      exprs => {
        // destructure so a wrong-arity call fails at analysis time instead
        // of silently dropping extra arguments
        val Seq(v) = exprs
        Int8QuantStatsExpr(v)
      },
      "int8_quant_stats(vec) - symmetric int8 quantization stats (sum_q, sum_abs_q, n_saturated)."))
}
