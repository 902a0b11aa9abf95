package graft.sources.nsq

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** nsqlookupd topic discovery: `GET /lookup?topic=<t>` on each lookupd,
  * union the advertised producers. This is how production NSQ consumers
  * find nsqds (the reference skips it and connects to one static nsqd,
  * main.go:29,124 — its `nsqd-tcp-address` flag); the engine supports both.
  *
  * Response shapes handled: modern (`{"producers":[...]}`) and the pre-1.0
  * envelope (`{"status_code":200,"data":{"producers":[...]}}`). Each
  * producer contributes `broadcast_address:tcp_port`.
  */
object NsqLookupd {

  /** One advertised nsqd: TCP for the consumer connection, HTTP for the
    * stats-based admission control ([[NsqStats]]). nsqd defaults http to
    * tcp + 1 when a producer omits it (pre-1.0 lookupds). */
  final case class Producer(host: String, tcpPort: Int, httpPort: Int)

  private def get(url: String, timeoutMs: Long): String = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs)).build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  private def producers(root: JsonNode): JsonNode = {
    val direct = root.path("producers")
    if (direct.isArray) direct else root.path("data").path("producers")
  }

  /** Resolve `topic`'s nsqds from one or more lookupds; order-stable,
    * deduplicated. Unreachable lookupds are skipped (any one answering is
    * enough); no lookupd answering with producers is an error — silently
    * consuming nothing would look like an idle topic. */
  def resolve(
      lookupds: Seq[(String, Int)],
      topic: String,
      timeoutMs: Long = 5000): Seq[(String, Int)] =
    resolveProducers(lookupds, topic, timeoutMs).map(p => (p.host, p.tcpPort))

  /** Like [[resolve]] but keeps each producer's advertised http_port. */
  def resolveProducers(
      lookupds: Seq[(String, Int)],
      topic: String,
      timeoutMs: Long = 5000): Seq[Producer] = {
    val mapper = new ObjectMapper()
    val found = Seq.newBuilder[Producer]
    var reached = false
    lookupds.foreach { case (host, port) =>
      try {
        val body = get(s"http://$host:$port/lookup?topic=$topic", timeoutMs)
        reached = true
        val ps = producers(mapper.readTree(body))
        (0 until ps.size()).foreach { i =>
          val p = ps.get(i)
          val addr = p.path("broadcast_address").asText("")
          val tcp = p.path("tcp_port").asInt(-1)
          val http = p.path("http_port").asInt(tcp + 1)
          if (addr.nonEmpty && tcp > 0) found += Producer(addr, tcp, http)
        }
      } catch { case _: java.io.IOException => () }
    }
    val out = found.result().distinct
    if (out.isEmpty)
      throw new java.io.IOException(
        if (reached) s"no nsqd advertises topic '$topic' on ${lookupds.size} lookupd(s)"
        else s"no lookupd reachable of ${lookupds.mkString(",")}")
    out
  }
}
