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
  * Kinesis JSON protocol uses. Path and query are URI-encoded here per the
  * spec's UriEncode rules (idempotently: existing `%XX` escapes pass
  * through, so both raw and pre-encoded inputs sign correctly; a literal
  * `%` that is not an escape fails fast) and query pairs are byte-sorted.
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

  /** AWS-spec UriEncode (public SigV4 docs pseudocode): unreserved
    * characters (A-Z a-z 0-9 - _ . ~) pass through, `/` passes unless
    * `encodeSlash`, and everything else becomes uppercase `%XX` per UTF-8
    * byte. Idempotent on canonical input: a well-formed `%XX` escape is
    * preserved rather than double-encoded; a bare `%` fails fast (a caller
    * meaning a literal percent must pre-encode it as `%25`). */
  def uriEncode(s: String, encodeSlash: Boolean): String = {
    def isHex(c: Char) = (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val c = s.charAt(i)
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~'
      if (unreserved || (c == '/' && !encodeSlash)) { sb.append(c); i += 1 }
      else if (c == '%') {
        require(i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2)),
          s"malformed %-escape at index $i of '$s': encode a literal percent as %25")
        sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else {
        new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8)
          .foreach(b => sb.append(f"%%${b & 0xff}%02X"))
        i += Character.charCount(cp)
      }
    }
    sb.toString()
  }

  /** Step 1: canonical request + the `SignedHeaders` list derived from it.
    * Header names are lowercased, values trimmed, sorted by name; path and
    * query URI-encoded per [[uriEncode]]; query pairs byte-sorted by
    * encoded key then value. Returns (canonicalRequest, signedHeaders). */
  def canonicalRequest(
      method: String,
      path: String,
      query: String,
      headers: Seq[(String, String)],
      payloadHashHex: String): (String, String) = {
    val canon = headers.map { case (k, v) => (k.toLowerCase, v.trim) }.sortBy(_._1)
    val signedHeaders = canon.map(_._1).mkString(";")
    val canonicalQuery =
      if (query.isEmpty) ""
      else query.split("&").toSeq.filter(_.nonEmpty).map { pair =>
        val (k, v) = pair.indexOf('=') match {
          case -1 => (pair, "")
          case at => (pair.substring(0, at), pair.substring(at + 1))
        }
        (uriEncode(k, encodeSlash = true), uriEncode(v, encodeSlash = true))
      }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val canonicalPath = uriEncode(if (path.isEmpty) "/" else path, encodeSlash = false)
    val cr = new StringBuilder()
      .append(method).append('\n')
      .append(canonicalPath).append('\n')
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
