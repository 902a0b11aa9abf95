package graft.sources.nsq

import graft.SparkSuite
import graft.streaming.{InMemoryTransport, StreamPipeline}
import graft.kernel.KplProtobuf

class NsqSourceSpec extends SparkSuite {

  private def msgId(i: Int): String = f"$i%016d"

  test("protocol codec round-trips messages") {
    val m = NsqProtocol.NsqMessage(msgId(7), 123456789L, 3, "hello".getBytes)
    val decoded = NsqProtocol.decodeMessage(NsqProtocol.encodeMessage(m))
    assert(decoded.id === m.id)
    assert(decoded.timestampNs === m.timestampNs)
    assert(decoded.attempts === 3)
    assert(new String(decoded.body) === "hello")
  }

  test("client consumes from mini server, answers heartbeats, FINs on demand") {
    val server = new NsqMiniServer
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val client = new NsqClient("127.0.0.1", server.port, "t", "ch",
      maxInFlight = 100, onMessage = m => got.add(new String(m.body)))
    try {
      server.awaitSubscribe()
      (0 until 5).foreach(i => server.publish(msgId(i), s"m$i".getBytes))
      eventually() { assert(got.size === 5) }
      server.sendHeartbeat() // must be answered with NOP, not break the stream
      server.publish(msgId(5), "after-hb".getBytes)
      eventually() { assert(got.size === 6) }
      client.fin(msgId(0))
      eventually() { assert(server.finned.contains(msgId(0))) }
    } finally { client.close(); server.close() }
  }

  test("end-to-end: nsq source -> dedup/pack pipeline -> kinesis entries, FIN after commit") {
    val server = new NsqMiniServer
    InMemoryTransport.clear()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nsq-ckpt").toString
    val stream = spark.readStream
      .format("nsq")
      .option("host", "127.0.0.1")
      .option("port", server.port.toString)
      .option("topic", "t")
      .option("channel", "ch")
      .load()

    val q = StreamPipeline.build(stream, new InMemoryTransport,
      StreamPipeline.Options(streamName = "nsq-e2e", checkpoint = ckpt))
      .start()
    try {
      server.awaitSubscribe()
      (0 until 20).foreach(i => server.publish(msgId(i), s"payload-$i".getBytes))
      (0 until 5).foreach(i => server.publish(msgId(100 + i), s"payload-$i".getBytes)) // dupes
      var user = Vector.empty[String]
      eventually(timeoutMs = 30000) {
        q.processAllAvailable()
        user ++= InMemoryTransport.drain().flatMap { case (_, e) =>
          if (KplProtobuf.isAggregated(e.data)) KplProtobuf.deframe(e.data).records.map(_.data)
          else Vector(e.data)
        }.map(new String(_))
        assert(user.toSet === (0 until 20).map(i => s"payload-$i").toSet)
      }
      // offsets commit after the sink epoch -> server must see FINs
      eventually(timeoutMs = 30000) {
        q.processAllAvailable()
        assert(server.finned.size >= 20)
      }
    } finally { q.stop(); server.close() }
  }

  test("micro-batch slices split into multiple InputPartitions (pre-shuffle parallelism)") {
    val server = new NsqMiniServer
    val opts = new java.util.HashMap[String, String]()
    opts.put("host", "127.0.0.1")
    opts.put("port", server.port.toString)
    opts.put("topic", "t")
    opts.put("channel", "ch")
    opts.put("numPartitions", "3")
    val stream = new NsqMicroBatchStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
    try {
      stream.latestOffset() // connects the consumer
      server.awaitSubscribe()
      (0 until 10).foreach(i => server.publish(msgId(i), s"m$i".getBytes))
      eventually() {
        assert(stream.latestOffset().asInstanceOf[NsqOffset].position === 10L)
      }
      val parts = stream.planInputPartitions(NsqOffset(0), NsqOffset(10))
      assert(parts.length === 3, "slice must split across partitions")
      val rows = parts.flatMap(_.asInstanceOf[NsqInputPartition].rows)
      assert(rows.length === 10)
      assert(rows.map(_.id).toSeq === (0 until 10).map(msgId)) // order preserved across chunks
    } finally { stream.stop(); server.close() }
  }

  test("two brokers: messages from both delivered, FINs routed to the right broker") {
    val s1 = new NsqMiniServer
    val s2 = new NsqMiniServer
    InMemoryTransport.clear()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nsq2-ckpt").toString
    val stream = spark.readStream
      .format("nsq")
      .option("hosts", s"127.0.0.1:${s1.port},127.0.0.1:${s2.port}")
      .option("topic", "t")
      .option("channel", "ch")
      .load()
    val q = StreamPipeline.build(stream, new InMemoryTransport,
      StreamPipeline.Options(streamName = "nsq-2b", checkpoint = ckpt))
      .start()
    try {
      s1.awaitSubscribe(); s2.awaitSubscribe()
      (0 until 10).foreach(i => s1.publish(msgId(i), s"b1-$i".getBytes))
      (0 until 10).foreach(i => s2.publish(msgId(100 + i), s"b2-$i".getBytes))
      var user = Vector.empty[String]
      eventually(timeoutMs = 30000) {
        q.processAllAvailable()
        user ++= InMemoryTransport.drain().flatMap { case (_, e) =>
          if (KplProtobuf.isAggregated(e.data)) KplProtobuf.deframe(e.data).records.map(_.data)
          else Vector(e.data)
        }.map(new String(_))
        assert(user.toSet ===
          ((0 until 10).map(i => s"b1-$i") ++ (0 until 10).map(i => s"b2-$i")).toSet)
      }
      // each broker must see FINs for exactly the ids it delivered
      eventually(timeoutMs = 30000) {
        q.processAllAvailable()
        assert((0 until 10).forall(i => s1.finned.contains(msgId(i))))
        assert((0 until 10).forall(i => s2.finned.contains(msgId(100 + i))))
        assert(!s1.finned.contains(msgId(100)) && !s2.finned.contains(msgId(0)))
      }
    } finally { q.stop(); s1.close(); s2.close() }
  }

  test("lookupd discovery: brokers resolved from the /lookup HTTP API, both consumed") {
    val s1 = new NsqMiniServer
    val s2 = new NsqMiniServer
    // stub nsqlookupd advertising both mini-nsqds (modern response shape)
    val lookupd = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    lookupd.createContext("/lookup", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body =
        s"""{"producers":[
           |{"broadcast_address":"127.0.0.1","tcp_port":${s1.port}},
           |{"broadcast_address":"127.0.0.1","tcp_port":${s2.port}}]}""".stripMargin
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b); ex.close()
    })
    lookupd.start()
    try {
      val resolved = NsqLookupd.resolve(
        Seq(("127.0.0.1", lookupd.getAddress.getPort)), "t")
      assert(resolved === Seq(("127.0.0.1", s1.port), ("127.0.0.1", s2.port)))

      val opts = new java.util.HashMap[String, String]()
      opts.put("lookupd", s"127.0.0.1:${lookupd.getAddress.getPort}")
      opts.put("topic", "t")
      opts.put("channel", "ch")
      val stream = new NsqMicroBatchStream(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
      try {
        stream.latestOffset() // connect consumers to every discovered broker
        s1.awaitSubscribe(); s2.awaitSubscribe()
        s1.publish(msgId(1), "from-1".getBytes)
        s2.publish(msgId(2), "from-2".getBytes)
        eventually() {
          assert(stream.latestOffset().asInstanceOf[NsqOffset].position === 2L)
        }
      } finally stream.stop()
    } finally { lookupd.stop(0); s1.close(); s2.close() }
  }

  test("lookupd resolve fails loudly when no producer advertises the topic") {
    val empty = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    empty.createContext("/lookup", (ex: com.sun.net.httpserver.HttpExchange) => {
      val b = """{"producers":[]}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b); ex.close()
    })
    empty.start()
    try {
      val e = intercept[java.io.IOException] {
        NsqLookupd.resolve(Seq(("127.0.0.1", empty.getAddress.getPort)), "ghost")
      }
      assert(e.getMessage.contains("ghost"))
    } finally empty.stop(0)
  }

  private def eventually(timeoutMs: Long = 10000)(check: => Unit): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try { check; return }
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    throw last
  }
}
