package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.kernel.KinesisEntry

/** Kinesis-JSON-protocol transport: speaks the same `PutRecords` /
  * `CreateStream` wire calls the reference issues through the AWS SDK
  * (kinesis_writer.go:93-96, test-mode CreateStream main.go:77-97), against
  * any HTTP endpoint that implements the Kinesis API — AWS itself behind a
  * signing proxy, or a kinesalite-style local endpoint (the reference's dev
  * environment, docker-compose.yml:1-14). No SDK dependency: the protocol is
  * `Content-Type: application/x-amz-json-1.1` + `X-Amz-Target:
  * Kinesis_20131202.<Op>` over POST with a small JSON body.
  *
  * Per-entry outcomes follow the Kinesis contract: HTTP 200 with a
  * `Records` array in request order, each element either a sequence number
  * (success) or an `ErrorCode` (throttle/internal error) — exactly the
  * signal the reference's per-slot Finish/Requeue routing consumes
  * (kinesis_writer.go:114-127). A non-200 response (connection refused,
  * 5xx) fails the whole request; both shapes surface as `false` flags that
  * [[RetryingTransport]] retries with backoff.
  *
  * With `credentials` set, every request carries an AWS [[SigV4]]
  * `Authorization` header (+ `X-Amz-Date`, and `X-Amz-Security-Token` for
  * STS) — the full credential path to real AWS, which the reference gets
  * from the SDK's default chain (main.go:77-97). Unsigned mode remains for
  * kinesalite-style local endpoints that ignore auth.
  *
  * Executor-safe: the class ships to tasks by closure; the HttpClient is
  * `@transient lazy`, rebuilt per JVM after deserialization.
  */
class HttpKinesisTransport(
    endpoint: String,
    requestTimeoutMs: Long = 10000,
    region: String = "us-east-1",
    credentials: Option[SigV4.Credentials] = None,
    clock: () => java.time.Instant = () => java.time.Instant.now()) extends KinesisTransport {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(requestTimeoutMs)).build()

  @transient private lazy val mapper = new ObjectMapper()

  private val contentType = "application/x-amz-json-1.1"

  private def call(target: String, body: String): HttpResponse[String] = {
    val uri = URI.create(endpoint)
    val amzTarget = s"Kinesis_20131202.$target"
    val b = HttpRequest.newBuilder(uri)
      .header("Content-Type", contentType)
      .header("X-Amz-Target", amzTarget)
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    credentials.foreach { creds =>
      val amzDate = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss'Z'")
        .withZone(java.time.ZoneOffset.UTC).format(clock())
      // sign the Host header the client will actually send (host[:port])
      val host = uri.getHost + (if (uri.getPort == -1) "" else s":${uri.getPort}")
      val signedHeaders = Seq(
        "content-type" -> contentType,
        "host" -> host,
        "x-amz-date" -> amzDate,
        "x-amz-target" -> amzTarget) ++
        creds.sessionToken.map("x-amz-security-token" -> _)
      val auth = SigV4.authorization(
        "POST", uri.getRawPath, Option(uri.getRawQuery).getOrElse(""),
        signedHeaders, body.getBytes(StandardCharsets.UTF_8),
        region, "kinesis", creds, amzDate)
      b.header("X-Amz-Date", amzDate)
      creds.sessionToken.foreach(t => b.header("X-Amz-Security-Token", t))
      b.header("Authorization", auth)
    }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** Test-mode stream provisioning (main.go:88-96): idempotent — an
    * already-existing stream (`ResourceInUseException`) is success. */
  def createStream(stream: String, shards: Int = 1): Unit = {
    val body = mapper.createObjectNode()
    body.put("StreamName", stream)
    body.put("ShardCount", shards)
    val resp = call("CreateStream", mapper.writeValueAsString(body))
    if (resp.statusCode() != 200 && !resp.body().contains("ResourceInUseException"))
      throw new java.io.IOException(
        s"CreateStream($stream) failed: HTTP ${resp.statusCode()} ${resp.body()}")
  }

  override def putRecords(stream: String, entries: Seq[KinesisEntry]): Seq[Boolean] = {
    val root = mapper.createObjectNode()
    root.put("StreamName", stream)
    val arr = root.putArray("Records")
    entries.foreach { e =>
      val rec = arr.addObject()
      rec.put("Data", Base64.getEncoder.encodeToString(e.data))
      rec.put("PartitionKey", e.partitionKey)
      e.explicitHashKey.foreach(rec.put("ExplicitHashKey", _))
    }
    val resp =
      try call("PutRecords", mapper.writeValueAsString(root))
      catch { case _: java.io.IOException => return Vector.fill(entries.size)(false) }
    if (resp.statusCode() != 200) return Vector.fill(entries.size)(false)
    val records = mapper.readTree(resp.body()).path("Records")
    if (!records.isArray || records.size() != entries.size)
      return Vector.fill(entries.size)(false)
    (0 until records.size()).map(i => !records.get(i).has("ErrorCode")).toVector
  }
}
