package graft.kernel

/** Morton (Z-order) interleaving — the multi-dimensional clustering key
  * behind OPTIMIZE ZORDER-style table layouts: sorting by the interleaved
  * key gives every contiguous key range bounded extent in EVERY input
  * dimension, so per-file min/max statistics prune scans on any of the
  * interleaved columns, not just the leading sort key.
  *
  * Pure static methods so the Catalyst expression's generated code can
  * call them directly (same pattern as [[MinHash]] / [[Fnv64a]]).
  */
object ZOrder {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i
    * (the classic parallel-prefix bit dilation). */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of the low 16 bits of (x, y): x occupies the even bit
    * positions, y the odd — a 32-bit value in [0, 2^32). Callers quantize
    * unbounded key domains into cell coordinates first (rank-space or
    * min/max normalization); masking raw keys would alias. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}
