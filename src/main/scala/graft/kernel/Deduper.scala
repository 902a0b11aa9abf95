package graft.kernel

import scala.collection.mutable

/** Two-generation streaming dedup set (reference: pkg/deduper/deduper.go).
  *
  * `test` returns true iff the key was seen in the current or previous
  * generation, and marks it seen in the current one. `trim()` demotes the
  * current generation and forgets generation n-2 — O(1) eviction with a
  * bounded memory footprint, without admitting duplicates across a naive
  * full reset boundary (deduper.go:8-16).
  *
  * The engine runs one instance per state-store partition (keys are routed
  * by hash), so no lock is needed — unlike the mutex in the Go original,
  * which shares one instance across 20 handler goroutines.
  */
final class Deduper {
  private var seen = mutable.HashSet.empty[Long]
  private var lastgen = mutable.HashSet.empty[Long]

  def test(body: Array[Byte]): Boolean = testHash(Fnv64a.hash(body))

  def testHash(h: Long): Boolean = {
    val res = seen.contains(h) || lastgen.contains(h)
    seen += h
    res
  }

  /** Advance the generation: current → last, n-2 dropped (deduper.go:42-47). */
  def trim(): Unit = {
    lastgen = seen
    seen = mutable.HashSet.empty[Long]
  }

  /** Approximate retained key count (both generations; may double-count). */
  def retained: Int = seen.size + lastgen.size
}
