package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer vectors for FNV-1a 64 (public test vectors from the FNV
  * reference page) + formatting parity with Go's %x. */
class Fnv64aSpec extends AnyFunSuite {
  test("empty input hashes to the offset basis") {
    assert(Fnv64a.hash(Array.emptyByteArray) === 0xcbf29ce484222325L)
  }
  test("known vectors") {
    assert(Fnv64a.hash("a") === 0xaf63dc4c8601ec8cL)
    assert(Fnv64a.hash("foobar") === 0x85944171f73967e8L)
    assert(Fnv64a.hash("hello") === 0xa430d84680aabd0bL)
  }
  test("hex formatting matches Go %x (lowercase, no leading zeros)") {
    assert(Fnv64a.hex("hello".getBytes) === "a430d84680aabd0b")
    assert(Fnv64a.hex("hello".getBytes).length === 16)
  }
}
