package graft.kernel

/** Sign-random-projection (SimHash-for-vectors) LSH kernel.
  *
  * Hyperplanes are deterministic ±1 vectors derived from
  * `Fnv64a.hash("p:i")` — the same derivation the round-1 ANN query inlined
  * as SQL literals — so every session, executor, and test agrees on the
  * buckets with no fitted state to ship.
  *
  * Banding math (the near-dup guarantee): a pair at angle θ disagrees on one
  * plane with probability θ/π. Planted near-dups (cosine ≈ 0.9998, θ ≈ 0.02)
  * agree on an 8-plane band with p ≈ 0.95, so the probability that 16 bands
  * ALL miss is ≈ 5e-21 — the banded join's result is equal to the exact
  * all-pairs join's w.h.p., while random pairs (cosine ≈ 0, p_agree ≈ 2^-8
  * per band) almost never collide: candidate volume scales with collisions,
  * not n².
  */
object HyperplaneLsh {

  /** (nPlanes, dim) → ±1 matrix, cached; tiny (≤ planes×dim doubles) and
    * rebuilt at most once per distinct shape per JVM. */
  @volatile private var cached: (Int, Int, Array[Array[Double]]) = _

  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val c = cached
    if (c != null && c._1 == nPlanes && c._2 == dim) return c._3
    val m = Array.tabulate(nPlanes, dim) { (p, i) =>
      if (((Fnv64a.hash(s"$p:$i") % 2) + 2) % 2 == 1) 1.0 else -1.0
    }
    cached = (nPlanes, dim, m)
    m
  }

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
