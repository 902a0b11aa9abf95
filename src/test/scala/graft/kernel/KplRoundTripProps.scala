package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized properties generalizing the reference round-trip test
  * (aggregator_test.go:118-138): for arbitrary record sets,
  * deaggregate(aggregate(xs)) == xs in order, and size/slot invariants hold.
  * (Seeded loops rather than ScalaCheck: the scalatest/scalacheck bridge
  * artifact isn't in the offline cache.)
  */
class KplRoundTripProps extends AnyFunSuite {

  private def trials[A](n: Int)(mk: Random => A)(check: A => Unit): Unit =
    (0 until n).foreach { i => check(mk(new Random(1000 + i))) }

  private def genRecords(r: Random, n: Int, maxLen: Int = 2000): Vector[(Array[Byte], String)] =
    Vector.fill(n) {
      val b = new Array[Byte](r.nextInt(maxLen + 1)); r.nextBytes(b)
      val key = r.nextInt(3) match {
        case 0 => ""
        case 1 => "k"
        case _ => r.alphanumeric.take(1 + r.nextInt(20)).mkString
      }
      (b, key)
    }

  test("deaggregate(aggregate(xs)) == xs, in order, across all entries") {
    trials(25)(r => genRecords(r, 50)) { recs =>
      val packer = new KplPacker
      recs.foreach { case (b, k) => packer.put(b, k) }
      val entries = packer.drain()
      val back = entries.flatMap { e =>
        if (KplProtobuf.isAggregated(e.data)) KplProtobuf.deframe(e.data).records.map(_.data)
        else Vector(e.data)
      }
      assert(back.length === recs.length)
      back.zip(recs).foreach { case (got, (want, _)) =>
        assert(java.util.Arrays.equals(got, want))
      }
    }
  }

  test("oversize records interleave with aggregates and round-trip as a multiset") {
    // NOTE: global record order is NOT preserved across the oversize-bypass
    // path — a standalone entry is appended to `completed` before the still-
    // open aggregate holding earlier records is closed (reference behavior:
    // aggregator.go:135-142 vs :148-159). Only within-aggregate order holds.
    trials(10) { r =>
      Vector.fill(30) {
        val n = if (r.nextInt(4) == 0) 25001 + r.nextInt(2000) else r.nextInt(2000)
        val b = new Array[Byte](n); r.nextBytes(b); (b, "k")
      }
    } { recs =>
      val packer = new KplPacker
      recs.foreach { case (b, k) => packer.put(b, k) }
      val back = packer.drain().flatMap { e =>
        if (KplProtobuf.isAggregated(e.data)) KplProtobuf.deframe(e.data).records.map(_.data)
        else Vector(e.data)
      }
      assert(back.length === recs.length)
      def canon(xs: Seq[Array[Byte]]) = xs.map(_.toSeq).sortBy(_.hashCode())
      assert(canon(back) === canon(recs.map(_._1)))
      // small records only => order preserved within the aggregate stream
      val smallIn = recs.map(_._1).filter(_.length <= 25000).map(_.toSeq)
      val smallOut = packer.drain() // empty; order checked via fresh packer below
      val p2 = new KplPacker
      recs.filter(_._1.length <= 25000).foreach { case (b, k) => p2.put(b, k) }
      val backSmall = p2.drain().flatMap(e => KplProtobuf.deframe(e.data).records.map(_.data.toSeq))
      assert(backSmall === smallIn)
      assert(smallOut.isEmpty)
    }
  }

  test("slots returned by put are valid, monotone entry indices (aggregate path)") {
    trials(25)(r => genRecords(r, 40).map { case (b, _) => (b, "k") }) { recs =>
      val packer = new KplPacker
      val slots = recs.map { case (b, k) => packer.put(b, k) }
      val entries = packer.drain()
      assert(slots.forall(s => s >= 0 && s < entries.length))
      assert(slots === slots.sorted)
    }
  }

  test("every framed entry obeys magic+md5; key indices address the key table") {
    trials(25)(r => genRecords(r, 60)) { recs =>
      val packer = new KplPacker
      recs.foreach { case (b, k) => packer.put(b, k) }
      packer.drain().foreach { e =>
        if (KplProtobuf.isAggregated(e.data)) {
          val agg = KplProtobuf.deframe(e.data)
          assert(agg.records.nonEmpty)
          assert(agg.records.forall(_.partitionKeyIndex < agg.partitionKeys.length))
        }
      }
    }
  }

  test("full envelope round-trips: explicit hash keys and tags survive encode/decode") {
    // proto/aggregation.proto:8,12-22 — the fields the Go aggregator never
    // sets but real KCL deaggregators produce/consume; a key-only Tag
    // (value=None) must stay distinct from an empty-valued one (Some("")).
    trials(25) { r =>
      def str(max: Int) = r.alphanumeric.take(r.nextInt(max + 1)).mkString
      val pkeys = Vector.fill(1 + r.nextInt(4))(str(12))
      val ehks = Vector.fill(r.nextInt(4))(BigInt(127, new Random(r.nextLong())).toString)
      val recs = Vector.fill(1 + r.nextInt(20)) {
        val b = new Array[Byte](r.nextInt(500)); r.nextBytes(b)
        val tags = Vector.fill(r.nextInt(3)) {
          KplProtobuf.Tag(str(8), r.nextInt(3) match {
            case 0 => None
            case 1 => Some("")
            case _ => Some(str(16))
          })
        }
        KplProtobuf.UserRecord(
          partitionKeyIndex = r.nextInt(pkeys.length).toLong,
          data = b,
          explicitHashKeyIndex =
            if (ehks.nonEmpty && r.nextBoolean()) Some(r.nextInt(ehks.length).toLong) else None,
          tags = tags)
      }
      KplProtobuf.Aggregated(pkeys, recs, ehks)
    } { agg =>
      val back = KplProtobuf.deframe(KplProtobuf.frame(agg))
      assert(back.partitionKeys === agg.partitionKeys)
      assert(back.explicitHashKeys === agg.explicitHashKeys)
      assert(back.records.length === agg.records.length)
      back.records.zip(agg.records).foreach { case (g, w) =>
        assert(g.partitionKeyIndex === w.partitionKeyIndex)
        assert(g.explicitHashKeyIndex === w.explicitHashKeyIndex)
        assert(java.util.Arrays.equals(g.data, w.data))
        assert(g.tags === w.tags)
      }
    }
  }

  test("pipeline-set explicit hash keys round-trip with per-record pairing intact") {
    // round-5 verdict task #2: EHKs threaded through put(), not just the
    // codec — dictionary-encoded per aggregate, entry-level EHK = first
    // record's (mirroring the first-record partition-key rule)
    trials(25) { r =>
      genRecords(r, 50).map { case (b, k) =>
        val ehk = if (r.nextBoolean()) BigInt(64, new Random(r.nextLong())).toString else ""
        (b, k, ehk)
      }
    } { recs =>
      val packer = new KplPacker
      recs.foreach { case (b, k, e) => packer.put(b, k, e) }
      val entries = packer.drain()
      val back = entries.flatMap { e =>
        if (KplProtobuf.isAggregated(e.data)) {
          val agg = KplProtobuf.deframe(e.data)
          // entry-level EHK follows record 0
          assert(e.explicitHashKey ===
            agg.records.head.explicitHashKeyIndex.map(i => agg.explicitHashKeys(i.toInt)))
          // the table holds exactly the distinct non-empty EHKs, referenced in range
          assert(agg.records.flatMap(_.explicitHashKeyIndex).forall(_ < agg.explicitHashKeys.length))
          agg.records.map(rec =>
            (rec.data.toSeq, rec.explicitHashKeyIndex.map(i => agg.explicitHashKeys(i.toInt))))
        } else Vector((e.data.toSeq, e.explicitHashKey))
      }
      assert(back.length === recs.length)
      back.zip(recs).foreach { case ((gotBody, gotEhk), (wantBody, _, wantEhk)) =>
        assert(gotBody === wantBody.toSeq)
        assert(gotEhk === Option(wantEhk).filter(_.nonEmpty))
      }
    }
  }

  test("dedup: any key tested, then trimmed twice, is always forgotten") {
    trials(25)(r => genRecords(r, 30)) { recs =>
      recs.foreach { case (b, _) =>
        val d = new Deduper
        d.test(b); d.trim(); d.trim()
        assert(!d.test(b))
      }
    }
  }
}
