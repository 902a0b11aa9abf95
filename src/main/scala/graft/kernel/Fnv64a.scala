package graft.kernel

/** FNV-64a hash, the reference engine's record-identity / partitioning hash
  * (reference: pkg/deduper/deduper.go:26-29, pkg/aggregator/aggregator.go:25-31).
  *
  * Pure function over bytes — no allocation, branch-free inner loop — so the
  * Catalyst expression wrapping it (graft.functions.Fnv64aExpr) stays inside
  * whole-stage codegen on the 100 TB hot path.
  */
object Fnv64a {
  final val OffsetBasis: Long = 0xcbf29ce484222325L
  final val Prime: Long = 0x100000001b3L

  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  def hash(s: String): Long = hash(s.getBytes("UTF-8"))

  /** Lowercase hex with no leading zeros — the reference formats the key with
    * Go's `fmt.Sprintf("%x", uint64)` (aggregator.go:30); Java's unsigned
    * `toHexString` matches that exactly. */
  def hex(bytes: Array[Byte]): String = java.lang.Long.toHexString(hash(bytes))
}
