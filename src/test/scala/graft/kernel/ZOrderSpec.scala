package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  /** Bit-by-bit reference: place bit i of x at 2i and bit i of y at 2i+1. */
  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave16 matches the bit-by-bit reference over the 8-bit grid") {
    for (x <- 0 to 255; y <- 0 to 255)
      assert(ZOrder.interleave16(x, y) === naive(x, y), s"($x, $y)")
  }

  test("interleave16 spot values") {
    assert(ZOrder.interleave16(0, 0) === 0L)
    assert(ZOrder.interleave16(0xFFFF, 0xFFFF) === 0xFFFFFFFFL)
    // x fills the even positions, y the odd
    assert(ZOrder.interleave16(0xFFFF, 0) === 0x55555555L)
    assert(ZOrder.interleave16(0, 0xFFFF) === 0xAAAAAAAAL)
    assert(ZOrder.interleave16(0xA, 0x5) === 102L) // 0b1100110
  }

  test("interleave16 masks to 16 bits (callers quantize, the kernel guards)") {
    assert(ZOrder.interleave16(0x1FFFF, 0x10000) === ZOrder.interleave16(0xFFFF, 0))
  }

  test("z-range buckets bound both dimensions: top 3 bits of each coordinate") {
    // bucket = z div 1024 over 8-bit cells keeps each bucket inside one
    // 32x32-cell tile (all cells of a bucket share x>>5 and y>>5) — the
    // pruning property a_zorder_layout reports
    val tiles = (for (x <- 0 to 255; y <- 0 to 255)
      yield (ZOrder.interleave16(x, y) / 1024, (x >> 5, y >> 5))).groupBy(_._1)
    tiles.foreach { case (b, cells) =>
      assert(cells.map(_._2).distinct.size === 1, s"bucket $b spans multiple 32x32 tiles")
    }
  }
}
