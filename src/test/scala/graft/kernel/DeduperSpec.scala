package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's op-string dedup table verbatim
  * (pkg/deduper/deduper_test.go:10-27): letters are message bodies, '#' is a
  * generation Trim(); final assertion is whether "a" is seen.
  */
class DeduperSpec extends AnyFunSuite {

  private def run(ops: String): Deduper = {
    val d = new Deduper
    ops.foreach {
      case '#' => d.trim()
      case c   => d.test(Array(c.toByte))
    }
    d
  }

  private def seenA(ops: String): Boolean = {
    val d = run(ops)
    // peek without marking: replicate Test's read side on a throwaway copy
    val h = Fnv64a.hash(Array('a'.toByte))
    val res = d.testHash(h)
    res
  }

  val cases: Seq[(String, Boolean)] = Seq(
    "" -> false,
    "a" -> true,
    "aa" -> true,
    "aaa" -> true,
    "a#" -> true,
    "a##" -> false,
    "a##a" -> true,
    "a#a#" -> true,
    "a#a##" -> false,
    "b" -> false,
    "ab" -> true,
    "bab" -> true
  )

  cases.foreach { case (ops, expected) =>
    test(s"""ops "$ops" => seen(a)=$expected""") {
      assert(seenA(ops) === expected)
    }
  }

  test("duplicate stream collapses in order (handler pass-through A2)") {
    // "aa" -> "a"; "a##a" -> "aa" (second 'a' passes after double trim)
    def passThrough(ops: String): String = {
      val d = new Deduper
      val out = new StringBuilder
      ops.foreach {
        case '#' => d.trim()
        case c   => if (!d.test(Array(c.toByte))) out += c
      }
      out.toString
    }
    assert(passThrough("aa") === "a")
    assert(passThrough("a##a") === "aa")
    assert(passThrough("bab") === "ba")
  }

  test("trim bounds memory: only two generations retained") {
    val d = new Deduper
    (0 until 1000).foreach(i => d.test(BigInt(i).toByteArray))
    d.trim()
    (1000 until 2000).foreach(i => d.test(BigInt(i).toByteArray))
    d.trim() // gen with 0..999 dropped now
    assert(d.retained === 1000)
  }
}
