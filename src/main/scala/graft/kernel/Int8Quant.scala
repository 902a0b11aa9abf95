package graft.kernel

/** Symmetric int8 quantization: scale = max|x|, each component mapped to
  * floor(x·127/scale + 0.5) ∈ [-127, 127]. The arithmetic is the exact
  * sequence of IEEE-754 double ops the engine's SQL oracle specifies —
  * (x * 127.0) / scale, then +0.5, then floor — so kernel and SQL agree
  * bit-for-bit. Shared by the codegen expression (ArrayExprs) and specs.
  */
object Int8Quant {

  /** `[sum_q, sum_abs_q, n_saturated]` over the quantized components, or
    * `null` when the vector has no positive magnitude (scale ≤ 0: the
    * all-zero vector quantizes to nothing meaningful and is filtered) OR
    * carries any non-finite component. NaN/Inf must not pass through:
    * `math.floor(NaN).toLong == 0` would silently quantize garbage to 0
    * here while the SQL oracle's `CAST(floor(NaN) AS BIGINT)` errors — a
    * cross-engine divergence. Null-ing the row keeps both engines in
    * lock-step, matching the zero-vector contract. */
  def stats(xs: Array[Double]): Array[Long] = {
    var scale = 0.0
    var i = 0
    while (i < xs.length) {
      val a = math.abs(xs(i))
      if (!java.lang.Double.isFinite(a)) return null
      if (a > scale) scale = a
      i += 1
    }
    if (!(scale > 0)) return null
    var sumQ = 0L
    var sumAbsQ = 0L
    var nSat = 0L
    i = 0
    while (i < xs.length) {
      val q = math.floor(xs(i) * 127.0 / scale + 0.5).toLong
      sumQ += q
      sumAbsQ += math.abs(q)
      if (math.abs(q) == 127L) nSat += 1
      i += 1
    }
    Array(sumQ, sumAbsQ, nSat)
  }
}
