package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Ports the reference's packing-math tests (pkg/aggregator/aggregator_test.go)
  * — exact sizes, slots, aggregate counts — plus round-trip through our own
  * independent deframe/decode (mirroring the external deaggregation library
  * the reference tests against, aggregator_test.go:118-138).
  */
class KplPackerSpec extends AnyFunSuite {

  private def rand(n: Int, seed: Int = 42): Array[Byte] = {
    val b = new Array[Byte](n); new Random(seed).nextBytes(b); b
  }

  test("basic insert: hello => count 1, size 21 (5 body + 16 hex key), slot 0") {
    val a = new KplPacker
    val slot = a.put("hello".getBytes)
    assert(a.count === 1)
    assert(a.size === 21)
    assert(a.recs === 1)
    assert(slot === 0)
  }

  test("additional insert: world => size 42, still 1 aggregate, slot 0") {
    val a = new KplPacker
    a.put("hello".getBytes)
    val slot = a.put("world".getBytes)
    assert(a.size === 42)
    assert(a.count === 2)
    assert(a.recs === 1)
    assert(slot === 0)
  }

  test("24999-byte keyed record closes aggregate: +25003 bytes, 2 recs, slot 1") {
    val a = new KplPacker
    a.put("hello".getBytes)
    a.put("world".getBytes)
    val pre = a.size
    val slot = a.put(rand(24999), "rand")
    assert(a.size - pre === 25003)
    assert(a.recs === 2)
    assert(slot === 1)
  }

  test("drain: 3 entries; hello+world envelope is exactly 78 bytes") {
    val a = new KplPacker
    a.put("hello".getBytes)
    a.put("world".getBytes)
    a.put(rand(24999), "rand")
    val slot = a.put("extra".getBytes)
    assert(slot === 2)
    val res = a.drain()
    assert(res.length === 3)
    // 78 = 10 body + 32 keys + 4 magic + 16 md5 + 16 protobuf overhead
    assert(res(0).data.length === 78)
  }

  test("drain resets count/size/recs to zero") {
    val a = new KplPacker
    a.put("here".getBytes); a.put("there".getBytes); a.put("back".getBytes)
    a.drain()
    assert(a.count === 0 && a.size === 0 && a.recs === 0)
  }

  test("empty drain works") {
    assert(new KplPacker().drain() === Vector())
  }

  test("round-trip through deaggregator returns original records in order") {
    val a = new KplPacker
    a.put("this".getBytes)
    a.put("that".getBytes)
    val res = a.drain()
    val agg = KplProtobuf.deframe(res(0).data)
    assert(agg.records.length === 2)
    assert(new String(agg.records(0).data) === "this")
    assert(new String(agg.records(1).data) === "that")
  }

  test("aggregate boundary: 1+24994 fit; next record opens a new aggregate") {
    val a = new KplPacker
    a.put("a".getBytes, "b")
    val before = a.recs
    a.put(rand(24994), "rand")
    assert(a.recs - before === 0) // 2+24994+4 == 25000, not > 25000
    a.put("one".getBytes, "more")
    assert(a.recs - before === 1)
  }

  test("same key 3x => partition_key_table has exactly 1 entry") {
    val a = new KplPacker
    a.put("too".getBytes, "p1"); a.put("and".getBytes, "p1"); a.put("fro".getBytes, "p1")
    val res = a.drain()
    val agg = KplProtobuf.deframe(res(0).data)
    assert(agg.partitionKeys === Vector("p1"))
    assert(agg.records.forall(_.partitionKeyIndex === 0L))
  }

  test("oversize slot routing: standalone entries report their actual index") {
    val a = new KplPacker
    a.put("small".getBytes, "k")            // in-flight aggregate
    val slot = a.put(rand(26000), "big")    // bypass -> completed(0)
    assert(slot === 0, "oversize entry's actual index (deviates from Go's off-by-one)")
    val entries = a.drain()
    assert(entries(slot).partitionKey === "big")
  }

  test("26000-byte record bypasses as standalone entry: +26003 bytes, +1 rec") {
    val a = new KplPacker
    val preSize = a.size; val preRecs = a.recs
    a.put(rand(26000), "big")
    assert(a.size - preSize === 26003)
    assert(a.recs - preRecs === 1)
    val res = a.drain()
    assert(res.length === 1)
    assert(res(0).data.length === 26000) // raw, unframed
    assert(res(0).partitionKey === "big")
    assert(!KplProtobuf.isAggregated(res(0).data) || res(0).data.length < 20)
  }

  test("invariant: 1000 x 1kB records, one key => 42 aggregates (bench fixture)") {
    val a = new KplPacker
    val rec = rand(1000)
    (0 until 1000).foreach(_ => a.put(rec, "a"))
    assert(a.count === 1000)
    assert(a.recs === 42)
  }

  test("invariant: 100 x 1kB => 5 aggregates (drain bench fixture)") {
    val a = new KplPacker
    val rec = rand(1000)
    (0 until 100).foreach(_ => a.put(rec, "a"))
    assert(a.recs === 5)
    assert(a.drain().length === 5)
  }

  test("invalid keys fall back to body-hash key") {
    val a = new KplPacker
    a.put("hello".getBytes, "")               // empty => fallback
    a.put("hello".getBytes, "x" * 256)        // too long => fallback
    val res = a.drain()
    val agg = KplProtobuf.deframe(res(0).data)
    assert(agg.partitionKeys === Vector(Fnv64a.hex("hello".getBytes)))
  }

  test("finalized entry's kinesis key is the FIRST user record's key") {
    val a = new KplPacker
    a.put("x".getBytes, "first"); a.put("y".getBytes, "second")
    val res = a.drain()
    assert(res(0).partitionKey === "first")
  }
}
