package graft.kernel

import java.io.ByteArrayOutputStream
import java.security.MessageDigest

/** Minimal hand-rolled protobuf codec for the KPL aggregation envelope
  * (reference: proto/aggregation.proto:6-22). The schema is tiny and frozen,
  * so we encode/decode it directly instead of depending on protobuf-java
  * (which the zero-egress build couldn't resolve anyway).
  *
  * Wire schema:
  * {{{
  * AggregatedRecord { repeated string partition_key_table = 1;
  *                    repeated string explicit_hash_key_table = 2;
  *                    repeated Record records = 3; }
  * Record { required uint64 partition_key_index = 1;
  *          optional uint64 explicit_hash_key_index = 2;
  *          required bytes data = 3;
  *          repeated Tag tags = 4; }
  * Tag    { required string key = 1; optional string value = 2; }
  * }}}
  *
  * Framing (aggregator.go:16,50-56): 4-byte magic 0xF3899AC2 + protobuf
  * payload + 16-byte MD5 of the payload.
  */
object KplProtobuf {

  val Magic: Array[Byte] = Array(0xf3, 0x89, 0x9a, 0xc2).map(_.toByte)

  /** `Tag { required key = 1; optional value = 2 }`
    * (proto/aggregation.proto:12-15). `value = None` encodes as key-only —
    * distinct on the wire from `Some("")`, so both must round-trip. */
  final case class Tag(key: String, value: Option[String] = None)

  final case class UserRecord(
      partitionKeyIndex: Long,
      data: Array[Byte],
      explicitHashKeyIndex: Option[Long] = None,
      tags: Seq[Tag] = Nil)

  final case class Aggregated(
      partitionKeys: Seq[String],
      records: Seq[UserRecord],
      explicitHashKeys: Seq[String] = Nil)

  // ---------------------------------------------------------------- encode

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeBytesField(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2) // wire type 2 = length-delimited
    writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  private def writeVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, (field << 3).toLong) // wire type 0 = varint
    writeVarint(out, v)
  }

  private def encodeTag(t: Tag): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    writeBytesField(out, 1, t.key.getBytes("UTF-8"))
    t.value.foreach(v => writeBytesField(out, 2, v.getBytes("UTF-8")))
    out.toByteArray
  }

  private def encodeRecord(r: UserRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream(r.data.length + 10)
    writeVarintField(out, 1, r.partitionKeyIndex)
    r.explicitHashKeyIndex.foreach(writeVarintField(out, 2, _))
    writeBytesField(out, 3, r.data)
    r.tags.foreach(t => writeBytesField(out, 4, encodeTag(t)))
    out.toByteArray
  }

  /** Protobuf-encode the AggregatedRecord body (no framing). */
  def encode(agg: Aggregated): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    agg.partitionKeys.foreach(k => writeBytesField(out, 1, k.getBytes("UTF-8")))
    agg.explicitHashKeys.foreach(k => writeBytesField(out, 2, k.getBytes("UTF-8")))
    agg.records.foreach(r => writeBytesField(out, 3, encodeRecord(r)))
    out.toByteArray
  }

  def md5(b: Array[Byte]): Array[Byte] = MessageDigest.getInstance("MD5").digest(b)

  /** Full Kinesis-record framing: magic + payload + md5(payload). */
  def frame(agg: Aggregated): Array[Byte] = {
    val raw = encode(agg)
    val out = new ByteArrayOutputStream(raw.length + 20)
    out.write(Magic, 0, 4)
    out.write(raw, 0, raw.length)
    val digest = md5(raw)
    out.write(digest, 0, digest.length)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Bounds-checked protobuf reader. Every length and every advance is
    * validated against the buffer (round-14 fuzz hardening): without
    * these checks, adversarial bytes — which CAN carry a valid MD5
    * trailer, since the producer computes it over its own payload — could
    * claim a 2 GB field length (`Arrays.copyOfRange` zero-PADS past the
    * source, so a 30-byte input allocated gigabytes) or a NEGATIVE length
    * (`pos += len` walked backwards: an infinite re-parse loop). All
    * malformed input now fails with `IllegalArgumentException`, the same
    * defined error the framing check uses — never an allocation bomb, a
    * hang, or a raw index error. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (shift <= 63) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("varint exceeds 64 bits")
    }
    private def checkedLen(): Int = {
      val len = readVarint()
      if (len < 0L || pos + len > end)
        throw new IllegalArgumentException(
          s"malformed length $len at $pos (end $end)")
      len.toInt
    }
    def readBytes(): Array[Byte] = {
      val len = checkedLen()
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }
    private def advance(n: Int): Unit = {
      if (pos + n > end)
        throw new IllegalArgumentException(s"truncated field at $pos (end $end)")
      pos += n
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => advance(8)
      case 2 => advance(checkedLen())
      case 5 => advance(4)
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  private def decodeTag(b: Array[Byte]): Tag = {
    val r = new Reader(b, 0, b.length)
    var key = ""
    var value: Option[String] = None
    while (r.hasMore) {
      val tag = r.readVarint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => key = new String(r.readBytes(), "UTF-8")
        case (2, 2) => value = Some(new String(r.readBytes(), "UTF-8"))
        case (_, w) => r.skip(w)
      }
    }
    Tag(key, value)
  }

  private def decodeRecord(b: Array[Byte]): UserRecord = {
    val r = new Reader(b, 0, b.length)
    var keyIdx = 0L
    var ehkIdx: Option[Long] = None
    var data: Array[Byte] = Array.emptyByteArray
    val tags = Seq.newBuilder[Tag]
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 0) => keyIdx = r.readVarint()
        case (2, 0) => ehkIdx = Some(r.readVarint())
        case (3, 2) => data = r.readBytes()
        case (4, 2) => tags += decodeTag(r.readBytes())
        case _      => r.skip(wire)
      }
    }
    UserRecord(keyIdx, data, ehkIdx, tags.result())
  }

  /** Decode a bare protobuf AggregatedRecord body. */
  def decode(raw: Array[Byte]): Aggregated = {
    val r = new Reader(raw, 0, raw.length)
    val keys = Seq.newBuilder[String]
    val ehks = Seq.newBuilder[String]
    val recs = Seq.newBuilder[UserRecord]
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) => keys += new String(r.readBytes(), "UTF-8")
        case (2, 2) => ehks += new String(r.readBytes(), "UTF-8")
        case (3, 2) => recs += decodeRecord(r.readBytes())
        case _      => r.skip(wire)
      }
    }
    Aggregated(keys.result(), recs.result(), ehks.result())
  }

  /** True iff the buffer carries the KPL magic + valid MD5 trailer. */
  def isAggregated(framed: Array[Byte]): Boolean =
    framed.length >= 20 &&
      framed(0) == Magic(0) && framed(1) == Magic(1) &&
      framed(2) == Magic(2) && framed(3) == Magic(3) && {
        val raw = java.util.Arrays.copyOfRange(framed, 4, framed.length - 16)
        val trailer = java.util.Arrays.copyOfRange(framed, framed.length - 16, framed.length)
        java.util.Arrays.equals(md5(raw), trailer)
      }

  /** Unframe + decode; mirrors the KCL deaggregation contract the reference
    * round-trips against (aggregator_test.go:118-138). */
  def deframe(framed: Array[Byte]): Aggregated = {
    require(isAggregated(framed), "not a KPL aggregated record (bad magic or MD5)")
    decodeFramed(framed)
  }

  /** Unframe without re-verifying — for callers that already checked
    * [[isAggregated]] (the check costs a full MD5 over the payload; doing
    * it twice doubles the hash work on the deaggregation scan path). */
  def decodeFramed(framed: Array[Byte]): Aggregated =
    decode(java.util.Arrays.copyOfRange(framed, 4, framed.length - 16))
}
