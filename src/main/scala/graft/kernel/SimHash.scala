package graft.kernel

/** 64-bit SimHash over token streams (Charikar's scheme): each token's
  * FNV-64a hash votes ±1 per bit position; the fingerprint takes the sign.
  * Near-duplicate documents land within a small Hamming distance.
  *
  * Used by the `simhash64` UDF; the scale path is per-row computation inside
  * a scan (no shuffle), with near-dup candidate generation via bit-block
  * banding (split 64 bits into blocks, exact-match on blocks — same
  * structure as MinHash LSH banding).
  */
object SimHash {

  def simhash64(tokens: Iterable[String]): Long = {
    val counts = new Array[Int](64)
    val it = tokens.iterator
    while (it.hasNext) {
      val h = Fnv64a.hash(it.next().getBytes("UTF-8"))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var res = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) res |= (1L << i)
      i += 1
    }
    res
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
