package graft.tools

import graft.kernel._

/** Example consumer of the graft.kernel package: replays a duplicated
  * message stream through dedup → KPL packing → Kinesis entries →
  * deaggregation, printing the stats a pipeline operator would watch.
  * Run: `sbt "runMain graft.tools.KernelPipelineDemo"`.
  */
object KernelPipelineDemo {
  def main(args: Array[String]): Unit = {
    val bodies = (0 until 500).map(i => s"event-$i payload ${"x" * 100}".getBytes)
    val stream = bodies.flatMap(b => Seq(b, b)) // at-least-once redelivery dupes
    val d = new Deduper
    val unique = stream.filterNot(d.test)
    println(s"stream=${stream.size} unique=${unique.size}")

    val p = new KplPacker
    unique.foreach(b => p.put(b))
    println(s"packed: count=${p.count} size=${p.size} entries=${p.recs}")
    val entries = p.drain()
    val back = entries.flatMap { e =>
      if (KplProtobuf.isAggregated(e.data)) KplProtobuf.deframe(e.data).records.map(_.data)
      else Seq(e.data)
    }
    val orderOK = back.zip(unique).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    println(s"entries=${entries.size} roundtrip=${back.size} orderOK=$orderOK")
    println(s"first entry key=${entries.head.partitionKey}")

    // hostile inputs
    val e0 = entries.head.data.clone; e0(e0.length - 1) = (e0(e0.length - 1) ^ 0xff).toByte
    println(s"probe corrupt-md5: isAggregated=${KplProtobuf.isAggregated(e0)} deframeFails=${scala.util.Try(KplProtobuf.deframe(e0)).isFailure}")
    println(s"probe 3-byte buffer: isAggregated=${KplProtobuf.isAggregated(Array[Byte](1, 2, 3))}")

    val p2 = new KplPacker
    p2.put("a".getBytes, "k" * 255); p2.put("b".getBytes, "k" * 256)
    val agg2 = KplProtobuf.deframe(p2.drain().head.data)
    println(s"probe key-boundary: len255->${agg2.partitionKeys(0).length} len256->fallback=${agg2.partitionKeys(1)}")

    val dd = new Deduper
    val k = "hot".getBytes
    val first = dd.test(k); dd.trim()
    val second = dd.test(k); dd.trim()
    val third = dd.test(k)
    println(s"probe hot-key survives trims while re-seen: $first/$second/$third")
  }
}
