package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process kinesalite-style Kinesis endpoint for transport e2e specs:
  * implements `CreateStream` and `PutRecords` of the
  * `application/x-amz-json-1.1` protocol, stores records per stream, and can
  * inject per-record throttle errors to exercise retry paths. Mirrors the
  * reference's dev environment (docker-compose.yml:1-14 runs kinesalite on
  * :4567) without needing a container.
  *
  * `failRecord(attemptNo, indexInRequest)` → respond with
  * `ProvisionedThroughputExceededException` for that record (it is NOT
  * stored), like a throttled shard.
  */
final class KinesisStubServer(failRecord: (Long, Int) => Boolean = (_, _) => false) {

  val streams = TrieMap.empty[String, Vector[(String, Array[Byte])]]
  private val requestNo = new AtomicLong(-1)
  private val seqNo = new AtomicLong(0)
  private val mapper = new ObjectMapper()

  /** Last request seen, for auth-header assertions (SigV4 e2e). */
  @volatile var lastHeaders: Map[String, String] = Map.empty
  @volatile var lastBody: String = ""

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastBody = body
      lastHeaders = {
        val it = ex.getRequestHeaders.entrySet().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          if (!e.getValue.isEmpty) b += (e.getKey.toLowerCase -> e.getValue.get(0))
        }
        b.result()
      }
      val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
      val (code, resp) = target.stripPrefix("Kinesis_20131202.") match {
        case "CreateStream" => createStream(body)
        case "PutRecords"   => putRecords(body)
        case other =>
          400 -> s"""{"__type":"UnknownOperationException","message":"$other"}"""
      }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  })
  server.start()

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}/"

  def stop(): Unit = server.stop(0)

  def records(stream: String): Vector[(String, Array[Byte])] =
    streams.getOrElse(stream, Vector.empty)

  private def createStream(body: String): (Int, String) = {
    val name = mapper.readTree(body).path("StreamName").asText()
    if (streams.putIfAbsent(name, Vector.empty).isDefined)
      400 -> s"""{"__type":"ResourceInUseException","message":"$name exists"}"""
    else 200 -> "{}"
  }

  private def putRecords(body: String): (Int, String) = {
    val root = mapper.readTree(body)
    val name = root.path("StreamName").asText()
    if (!streams.contains(name))
      return 400 -> s"""{"__type":"ResourceNotFoundException","message":"$name"}"""
    val attempt = requestNo.incrementAndGet()
    val recs = root.path("Records")
    val out = mapper.createObjectNode()
    val arr = out.putArray("Records")
    var failed = 0
    (0 until recs.size()).foreach { i =>
      if (failRecord(attempt, i)) {
        failed += 1
        val r = arr.addObject()
        r.put("ErrorCode", "ProvisionedThroughputExceededException")
        r.put("ErrorMessage", "throttled")
      } else {
        val data = Base64.getDecoder.decode(recs.get(i).path("Data").asText())
        val key = recs.get(i).path("PartitionKey").asText()
        streams.updateWith(name)(v => Some(v.getOrElse(Vector.empty) :+ (key -> data)))
        val r = arr.addObject()
        r.put("SequenceNumber", seqNo.incrementAndGet().toString)
        r.put("ShardId", "shardId-000000000000")
      }
    }
    out.put("FailedRecordCount", failed)
    200 -> mapper.writeValueAsString(out)
  }
}
