package graft.kernel

/** Sign-random-projection (SimHash-for-vectors) LSH kernel.
  *
  * Hyperplanes are deterministic ±1 vectors whose signs come from the top
  * bit of `MinHash.mix((p << 32) | i)` — a full-width splitmix64 mix of the
  * (plane, dimension) pair — so every session, executor, and test agrees on
  * the buckets with no fitted state to ship. The sign source matters: a
  * low-bit-of-FNV derivation (used before round 4) collapses every plane to
  * ±one dimension-parity vector, because FNV's odd-prime multiply preserves
  * the XOR of input low bits. splitmix64's avalanche makes each sign an
  * independent-looking fair coin, restoring the LSH geometry.
  *
  * Banding math (the near-dup guarantee): a pair at angle θ disagrees on one
  * plane with probability θ/π. Planted near-dups (cosine ≈ 0.9998,
  * θ ≈ 0.02) agree on a 12-plane band with p ≈ 0.93, so the probability
  * that 32 bands ALL miss is ≈ 2e-37 — the banded join's result equals the
  * exact all-pairs join's w.h.p. Random pairs on this corpus (cosine ≈ 0,
  * p_agree ≈ 2^-12 per band) almost never collide: measured on the sf0.01
  * doubled corpus (1,000 vectors, 500k pairs), 32×12 banding yields ~6.5k
  * candidate pairs vs ~427k for 32×4 — candidate volume scales with
  * collisions, not n².
  */
object HyperplaneLsh {

  /** (nPlanes, dim) → ±1 matrix. Tiny (planes×dim doubles), built at most
    * once per distinct shape per JVM; a map (not a single slot) so two
    * interleaved shapes — e.g. the 384-plane near-dup banding and the
    * 8-plane ANN bucket — don't thrash rebuilds. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nPlanes, dim), { key =>
      val (np, d) = key
      Array.tabulate(np, d) { (p, i) =>
        if (MinHash.mix((p.toLong << 32) | (i.toLong & 0xffffffffL)) < 0) 1.0 else -1.0
      }
    })

  private def dot(row: Array[Double], v: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(row.length, v.length)
    while (i < n) { acc += row(i) * v(i); i += 1 }
    acc
  }

  /** Band keys for `v`: `nBands` keys of `bandBits` sign bits each, the band
    * index packed into the high bits so one exploded column joins all bands
    * without cross-band collisions. */
  def bands(v: Array[Double], nBands: Int, bandBits: Int): Array[Long] = {
    val m = planes(nBands * bandBits, v.length)
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var key = b.toLong << bandBits
      var j = 0
      while (j < bandBits) {
        if (dot(m(b * bandBits + j), v) > 0) key |= 1L << j
        j += 1
      }
      out(b) = key
      b += 1
    }
    out
  }

  /** Multi-probe bucket list for a single-band table of `bandBits` planes:
    * the home bucket plus the buckets reached by flipping each of the
    * `nProbes - 1` lowest-|margin| planes (the planes most likely to be on
    * the wrong side for a true neighbor). Standard multi-probe LSH — recall
    * of T probes approaches that of T independent tables at one table's
    * memory cost. */
  def probes(v: Array[Double], bandBits: Int, nProbes: Int): Array[Long] = {
    val m = planes(bandBits, v.length)
    val margins = new Array[Double](bandBits)
    var home = 0L
    var j = 0
    while (j < bandBits) {
      val d = dot(m(j), v)
      margins(j) = math.abs(d)
      if (d > 0) home |= 1L << j
      j += 1
    }
    val order = (0 until bandBits).sortBy(margins(_)).toArray
    val n = math.min(nProbes, bandBits + 1)
    val out = new Array[Long](n)
    out(0) = home
    var k = 1
    while (k < n) { out(k) = home ^ (1L << order(k - 1)); k += 1 }
    out
  }
}
