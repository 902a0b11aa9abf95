package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing — the credential path the
  * reference gets from the AWS SDK's default credential chain
  * (main.go:77-97, kinesis_writer.go:93-96) and this engine implements
  * directly: the algorithm is public (AWS General Reference, "Signature
  * Version 4 signing process") and pure JVM — an HMAC-SHA256 key-derivation
  * chain over a canonical rendering of the request.
  *
  * Scope: header-based signing (`Authorization` header), which is what the
  * Kinesis JSON protocol uses. Query strings are expected pre-URI-encoded
  * (Kinesis POSTs have none; the test vector's is already canonical) — the
  * pairs are byte-sorted here per the spec.
  *
  * Verified in SigV4Spec against the published AWS test vector (the
  * `GET /?Action=ListUsers` IAM example with the documented
  * `AKIDEXAMPLE` credentials and expected signature).
  */
object SigV4 {

  /** Static credentials; `sessionToken` for STS temporary credentials
    * (adds the `x-amz-security-token` header to the signed set). */
  final case class Credentials(
      accessKeyId: String,
      secretAccessKey: String,
      sessionToken: Option[String] = None)

  private val Algorithm = "AWS4-HMAC-SHA256"

  def sha256Hex(data: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(data))

  private def hex(bytes: Array[Byte]): String =
    bytes.iterator.map(b => f"${b & 0xff}%02x").mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** Step 1: canonical request + the `SignedHeaders` list derived from it.
    * Header names are lowercased, values trimmed, sorted by name; query
    * pairs byte-sorted. Returns (canonicalRequest, signedHeaders). */
  def canonicalRequest(
      method: String,
      path: String,
      query: String,
      headers: Seq[(String, String)],
      payloadHashHex: String): (String, String) = {
    val canon = headers.map { case (k, v) => (k.toLowerCase, v.trim) }.sortBy(_._1)
    val signedHeaders = canon.map(_._1).mkString(";")
    val canonicalQuery =
      if (query.isEmpty) "" else query.split("&").toSeq.sorted.mkString("&")
    val cr = new StringBuilder()
      .append(method).append('\n')
      .append(if (path.isEmpty) "/" else path).append('\n')
      .append(canonicalQuery).append('\n')
      .append(canon.map { case (k, v) => s"$k:$v\n" }.mkString).append('\n')
      .append(signedHeaders).append('\n')
      .append(payloadHashHex)
      .toString()
    (cr, signedHeaders)
  }

  /** Step 3: the date/region/service-scoped signing key —
    * HMAC chain seeded with "AWS4" + secret. */
  def signingKey(secret: String, dateStamp: String, region: String, service: String): Array[Byte] =
    hmac(hmac(hmac(hmac(
      ("AWS4" + secret).getBytes(StandardCharsets.UTF_8), dateStamp), region), service),
      "aws4_request")

  /** Full signing: returns the `Authorization` header value for a request
    * whose signed headers are exactly `headers` (must include `host` and
    * `x-amz-date`; the caller sends them verbatim).
    *
    * @param amzDate ISO-basic UTC timestamp, e.g. "20150830T123600Z"
    */
  def authorization(
      method: String,
      path: String,
      query: String,
      headers: Seq[(String, String)],
      payload: Array[Byte],
      region: String,
      service: String,
      creds: Credentials,
      amzDate: String): String = {
    val dateStamp = amzDate.substring(0, 8)
    val (cr, signedHeaders) =
      canonicalRequest(method, path, query, headers, sha256Hex(payload))
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign =
      s"$Algorithm\n$amzDate\n$scope\n${sha256Hex(cr.getBytes(StandardCharsets.UTF_8))}"
    val signature =
      hex(hmac(signingKey(creds.secretAccessKey, dateStamp, region, service), stringToSign))
    s"$Algorithm Credential=${creds.accessKeyId}/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }
}
