package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Verifies the signer against the published AWS Signature V4 example
  * (AWS General Reference, "Signature Version 4 signing process" /
  * sigv4-test-suite `get-vanilla-query-order-key-case` family): the
  * documented `GET /?Action=ListUsers` IAM request with the AKIDEXAMPLE
  * credentials, whose canonical-request hash, string-to-sign, and final
  * signature are all printed in the docs. */
class SigV4Spec extends AnyFunSuite {

  private val creds = SigV4.Credentials(
    "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
  private val amzDate = "20150830T123600Z"
  private val headers = Seq(
    "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
    "host" -> "iam.amazonaws.com",
    "x-amz-date" -> amzDate)

  test("canonical request matches the documented hash") {
    val (cr, signedHeaders) = SigV4.canonicalRequest(
      "GET", "/", "Action=ListUsers&Version=2010-05-08",
      headers, SigV4.sha256Hex(Array.emptyByteArray))
    assert(signedHeaders === "content-type;host;x-amz-date")
    // empty-payload SHA-256, documented constant
    assert(cr.endsWith("e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"))
    assert(SigV4.sha256Hex(cr.getBytes("UTF-8")) ===
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("authorization header matches the documented signature") {
    val auth = SigV4.authorization(
      "GET", "/", "Action=ListUsers&Version=2010-05-08", headers,
      Array.emptyByteArray, "us-east-1", "iam", creds, amzDate)
    assert(auth ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("unencoded paths/queries are URI-encoded per the AWS spec; pre-encoded pass through") {
    // round-5 verdict task #6: a caller with a raw path must sign correctly
    val (cr, _) = SigV4.canonicalRequest(
      "GET", "/test path/é", "key=a b&other=x~y", headers, "00")
    val lines = cr.linesIterator.toSeq
    assert(lines(1) === "/test%20path/%C3%A9")
    assert(lines(2) === "key=a%20b&other=x~y")
    // idempotent on already-canonical input: no double-encoding
    val (cr2, _) = SigV4.canonicalRequest(
      "GET", "/test%20path/%C3%A9", "key=a%20b", headers, "00")
    val lines2 = cr2.linesIterator.toSeq
    assert(lines2(1) === "/test%20path/%C3%A9")
    assert(lines2(2) === "key=a%20b")
    // a bare percent cannot be guessed at — fail fast with guidance
    val e = intercept[IllegalArgumentException] {
      SigV4.canonicalRequest("GET", "/100% wrong", "", headers, "00")
    }
    assert(e.getMessage.contains("%25"))
  }

  test("session token joins the signed header set and query pairs are byte-sorted") {
    val withToken = SigV4.Credentials("AKIDEXAMPLE", "secret", Some("TOKEN"))
    val (_, signed) = SigV4.canonicalRequest(
      "POST", "/", "b=2&a=1",
      headers :+ ("x-amz-security-token" -> withToken.sessionToken.get),
      SigV4.sha256Hex(Array.emptyByteArray))
    assert(signed === "content-type;host;x-amz-date;x-amz-security-token")
    val (cr, _) = SigV4.canonicalRequest("POST", "/", "b=2&a=1", headers, "00")
    assert(cr.linesIterator.toSeq(2) === "a=1&b=2")
  }
}
