package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Guards the property the round-3 bug destroyed: plane signs derived from
  * FNV's low bit made every "hyperplane" (±)the same dimension-parity
  * vector, voiding the banding math while all unit tests stayed green.
  * These assertions recover the sign matrix through the public `bands` API
  * and fail on any such collapse. */
class HyperplaneLshSpec extends AnyFunSuite {

  private val dim = 64
  private val nBands = 16
  private val bits = 8
  private val nPlanes = nBands * bits

  /** signs(p)(i) = side of plane p for basis vector e_i — recovered via
    * bands() on unit vectors, so the spec tests the shipped code path. */
  private lazy val signs: Array[Array[Boolean]] = {
    val m = Array.ofDim[Boolean](nPlanes, dim)
    (0 until dim).foreach { i =>
      val v = Array.fill(dim)(0.0)
      v(i) = 1.0
      val keys = HyperplaneLsh.bands(v, nBands, bits)
      for (b <- 0 until nBands; j <- 0 until bits)
        m(b * bits + j)(i) = ((keys(b) >> j) & 1L) == 1L
    }
    m
  }

  test("all planes are distinct, and no plane is another's negation") {
    val asSets = signs.map(_.toVector)
    assert(asSets.distinct.length === nPlanes, "duplicate planes")
    val negations = asSets.map(_.map(!_))
    asSets.zipWithIndex.foreach { case (row, p) =>
      val neg = negations.indexOf(row)
      assert(neg == -1, s"plane $p is the exact negation of plane $neg")
    }
  }

  test("plane signs are balanced (fair-coin bound, ±4 sigma)") {
    signs.zipWithIndex.foreach { case (row, p) =>
      val ones = row.count(identity)
      assert(ones >= 16 && ones <= 48, s"plane $p has $ones/+1 signs of $dim")
    }
  }

  test("mean pairwise plane agreement is near one half") {
    val agreements = for {
      p <- 0 until nPlanes
      q <- (p + 1) until nPlanes
    } yield signs(p).zip(signs(q)).count { case (a, b) => a == b }.toDouble / dim
    val mean = agreements.sum / agreements.size
    assert(mean > 0.4 && mean < 0.6, f"mean agreement $mean%.3f — planes correlated")
    // the degenerate matrix had agreement ∈ {0, 1} for every pair
    assert(!agreements.exists(a => a == 0.0 || a == 1.0),
      "some plane pair identical/opposite on every dimension")
  }

  test("probes: home bucket first, then distinct single-plane flips") {
    val rnd = new scala.util.Random(7)
    val v = Array.fill(dim)(rnd.nextGaussian())
    val home = HyperplaneLsh.bands(v, 1, bits)(0)
    val probes = HyperplaneLsh.probes(v, bits, 3)
    assert(probes.length === 3)
    assert(probes(0) === (home & ((1L << bits) - 1)))
    assert(probes.distinct.length === 3)
    probes.drop(1).foreach { p =>
      assert(java.lang.Long.bitCount(p ^ probes(0)) === 1, "probe must flip exactly one plane")
    }
  }
}
