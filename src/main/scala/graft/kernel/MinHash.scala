package graft.kernel

/** MinHash signatures over pre-hashed shingle sets.
  *
  * Permutation family: h_k(x) = splitmix64(x ^ seed_k) with seed_k =
  * splitmix64(k) — a standard strong 64-bit mixer (public domain splitmix64
  * finalizer), far cheaper than re-hashing shingle strings per permutation.
  * Signature quality only needs pairwise-independent-ish mixing; the LSH
  * result is verified against exact Jaccard downstream, so the family is
  * free to change without affecting correctness.
  */
object MinHash {

  /** splitmix64 finalizer. */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** k-permutation signature of a shingle-hash set. Empty input yields a
    * signature of Long.MaxValue (matches "no shingles" semantics). */
  def signature(hashes: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < k) {
      val seed = mix(j.toLong)
      var i = 0
      var min = Long.MaxValue
      while (i < hashes.length) {
        val v = mix(hashes(i) ^ seed)
        if (v < min) min = v
        i += 1
      }
      sig(j) = min
      j += 1
    }
    sig
  }
}
