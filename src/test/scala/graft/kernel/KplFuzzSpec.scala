package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial fuzz harness for the KPL codec — the reference's TODO.md:12
  * fuzz item, realized against the attack surface that matters: the MD5
  * trailer only proves the payload arrived as SENT, not that it is
  * well-formed (a malicious producer signs its own bytes), so `decode`
  * must survive arbitrary protobuf bodies. Contract under fuzz: the codec
  * either returns a value or throws `IllegalArgumentException` — never a
  * raw index error, an allocation bomb (a 30-byte input once allocated
  * gigabytes via a claimed 2 GB field length: `Arrays.copyOfRange`
  * zero-pads past the source), and never a hang (a NEGATIVE claimed
  * length once walked `pos` backwards into an infinite re-parse loop).
  */
class KplFuzzSpec extends AnyFunSuite {

  private def sample: KplProtobuf.Aggregated = KplProtobuf.Aggregated(
    partitionKeys = Seq("k1", "k2"),
    records = Seq(
      KplProtobuf.UserRecord(0L, "payload-a".getBytes("UTF-8"), Some(1L),
        Seq(KplProtobuf.Tag("t", Some("v")))),
      KplProtobuf.UserRecord(1L, "payload-b".getBytes("UTF-8"), None, Nil)),
    explicitHashKeys = Seq("340282366920938463463374607431768211455"))

  private def decodeOutcome(body: => Any): Option[Throwable] =
    try { body; None } catch { case t: Throwable => Some(t) }

  test("10k random byte strings: decode returns or throws IllegalArgumentException, nothing else") {
    val rnd = new scala.util.Random(0xF3899AC2L) // seeded: failures reproduce
    (1 to 10000).foreach { i =>
      val bytes = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(bytes)
      decodeOutcome(KplProtobuf.decode(bytes)).foreach { t =>
        assert(t.isInstanceOf[IllegalArgumentException],
          s"iteration $i: decode threw ${t.getClass.getName}: ${t.getMessage}")
      }
      // framing of garbage must simply answer false (length/magic/md5)
      assert(!KplProtobuf.isAggregated(bytes) || bytes.length >= 20)
    }
  }

  test("every single-byte corruption of a valid frame is rejected by the MD5 gate") {
    val framed = KplProtobuf.frame(sample)
    framed.indices.foreach { i =>
      val mutated = framed.clone()
      mutated(i) = (mutated(i) ^ 0x5a).toByte
      assert(!KplProtobuf.isAggregated(mutated),
        s"flip at byte $i survived the magic+md5 gate")
    }
    assert(KplProtobuf.isAggregated(framed), "the unmutated frame must still verify")
  }

  test("every truncation of a valid frame is rejected or decodes as defined") {
    val framed = KplProtobuf.frame(sample)
    (0 until framed.length).foreach { n =>
      val cut = java.util.Arrays.copyOf(framed, n)
      // the md5-over-shorter-payload can never match the shifted trailer
      assert(!KplProtobuf.isAggregated(cut), s"truncation to $n bytes verified")
      decodeOutcome(KplProtobuf.deframe(cut)).foreach { t =>
        assert(t.isInstanceOf[IllegalArgumentException],
          s"truncation to $n threw ${t.getClass.getName}")
      }
    }
  }

  test("signed-but-malicious bodies: huge and negative claimed lengths fail fast, no allocation, no hang") {
    def framedBody(body: Array[Byte]): Array[Byte] = {
      // valid magic + valid MD5 over a hostile protobuf body — exactly what
      // a malicious producer can construct
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte), 0, 4)
      out.write(body, 0, body.length)
      val md = java.security.MessageDigest.getInstance("MD5").digest(body)
      out.write(md, 0, md.length)
      out.toByteArray
    }
    // field 1 (partition_key_table), wire 2, claimed length 2^31-1
    val huge = framedBody(Array[Byte](0x0a, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0x07))
    // field 1, wire 2, 10-byte varint decoding to a NEGATIVE long
    val negative = framedBody(Array[Byte](0x0a) ++ Array.fill(9)(0xff.toByte) :+ 0x01.toByte)
    // nested: a record (field 3) whose inner data field claims more than remains
    val nested = framedBody(Array[Byte](0x1a, 0x04, 0x1a, 0x7f, 0x00, 0x00))
    Seq("huge" -> huge, "negative" -> negative, "nested" -> nested).foreach {
      case (name, frame) =>
        assert(KplProtobuf.isAggregated(frame), s"$name: the hostile frame IS validly signed")
        val t0 = System.nanoTime()
        val out = decodeOutcome(KplProtobuf.deframe(frame))
        val ms = (System.nanoTime() - t0) / 1e6
        assert(out.exists(_.isInstanceOf[IllegalArgumentException]),
          s"$name: expected IllegalArgumentException, got $out")
        assert(ms < 1000.0, s"$name: decode took ${ms}ms — the fail must be fast")
    }
  }

  test("valid frames still round-trip after the bounds hardening") {
    val framed = KplProtobuf.frame(sample)
    val back = KplProtobuf.deframe(framed)
    assert(back.partitionKeys === sample.partitionKeys)
    assert(back.explicitHashKeys === sample.explicitHashKeys)
    assert(back.records.length === sample.records.length)
    back.records.zip(sample.records).foreach { case (b, s) =>
      assert(b.partitionKeyIndex === s.partitionKeyIndex)
      assert(b.explicitHashKeyIndex === s.explicitHashKeyIndex)
      assert(b.data.toSeq === s.data.toSeq)
      assert(b.tags === s.tags)
    }
  }
}
