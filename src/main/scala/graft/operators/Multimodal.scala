package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `BINARY` columns with typed metadata structs; decode / feature-extract /
  * frame-sample run as per-partition batch transforms (`mapPartitions` —
  * the JVM analogue of an Arrow-batched pandas UDF: one iterator per
  * partition, records processed in-stream, no per-row driver round-trip).
  *
  * The actual codecs are STUBS — this container has no image/audio
  * libraries — but deterministic ones, so the Spark-side plumbing (schema,
  * partitioning, batch shape) is real and the results are independently
  * checkable: payload bytes here are UTF-8 text, so the oracle can recompute
  * the same byte arithmetic from the text column.
  *
  * Scale posture: decode is scan-local map work (codegen'd projection +
  * one mapPartitions pass, no shuffle); the only exchange is the final
  * aggregation. Feature vectors feed the [[LlmOps]] ANN path unchanged.
  */
object Multimodal {

  /** Typed media-envelope row produced by the stub decoder. */
  final case class MediaRecord(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Long,
      features: Array[Float])

  /** STUB image decode: parses a fake header out of the first bytes.
    * Deterministic stand-in for an image library (`???` in spirit) — byte k
    * is `text[k]` since payloads are UTF-8 here. */
  def decodeStub(id: Long, content: Array[Byte]): MediaRecord = {
    def b(i: Int): Int = if (content.length > i) content(i) & 0xff else 0
    val fmt = (b(3) % 3) match {
      case 0 => "png"
      case 1 => "jpg"
      case _ => "webp"
    }
    val feats = new Array[Float](16)
    var i = 0
    while (i < 16) { feats(i) = b(i) / 255.0f; i += 1 }
    MediaRecord(
      media_id = id,
      format = fmt,
      width = (b(0) * 7) % 512 + 1,
      height = (b(1) * 13) % 512 + 1,
      channels = b(2) % 3 + 1,
      n_bytes = content.length.toLong,
      features = feats)
  }

  /** STUB frame sampler: every `stride`-th 16-byte window as a "frame". */
  def frameSampleStub(content: Array[Byte], stride: Int): Seq[Array[Byte]] =
    (0 until content.length by (stride max 1))
      .map(off => java.util.Arrays.copyOfRange(content, off, math.min(off + 16, content.length)))

  /** The decode pass: binary payloads → typed media records, one partition
    * iterator at a time. */
  def decodeAll(s: SparkSession, payloads: DataFrame): Dataset[MediaRecord] = {
    import s.implicits._
    payloads
      .select(col("media_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, content) => decodeStub(id, content) })
  }

  /** Driver-surface query: synthesize payloads from documents (UTF-8 bytes
    * as the opaque "image"), decode, profile by format. The DuckDB oracle
    * replays the identical header arithmetic from the text column.
    * Cross-engine determinism: the feature aggregate recovers the exact
    * source byte (`round(f0*255)` inverts the `b/255f` normalization, error
    * < 2^-16) and sums integers — a float sum would be partition-order
    * dependent; DuckDB integer sums are cast to BIGINT to avoid HUGEINT. */
  def hMultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("content"))
    decodeAll(s, payloads)
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("width")).cast("long").as("sum_width"),
        sum(col("height")).cast("long").as("sum_height"),
        sum(col("channels")).cast("long").as("sum_channels"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(round(element_at(col("features"), 1) * 255.0).cast("long")).as("sum_f0_x255"))
      .orderBy(col("format"))
  }

  /** Byte-exact oracle: DuckDB 1.0 can't substring a BLOB, but `hex(encode
    * (text))` exposes the UTF-8 bytes as hex pairs, so byte k is decoded
    * from `substr(hx, 2k+1, 2)` via strpos arithmetic — identical to the
    * Spark side's `content(k) & 0xff` on ANY corpus, ASCII or not (the
    * round-5 byte-vs-char trap is gone). */
  val hMultimodalDecodeSql: String =
    """WITH hx AS (
      |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n_bytes
      |  FROM documents),
      |hdr AS (
      |  SELECT doc_id, n_bytes,
      |    CASE WHEN n_bytes > 0 THEN (strpos('0123456789ABCDEF', substr(h, 1, 1))-1)*16
      |      + strpos('0123456789ABCDEF', substr(h, 2, 1))-1 ELSE 0 END AS b0,
      |    CASE WHEN n_bytes > 1 THEN (strpos('0123456789ABCDEF', substr(h, 3, 1))-1)*16
      |      + strpos('0123456789ABCDEF', substr(h, 4, 1))-1 ELSE 0 END AS b1,
      |    CASE WHEN n_bytes > 2 THEN (strpos('0123456789ABCDEF', substr(h, 5, 1))-1)*16
      |      + strpos('0123456789ABCDEF', substr(h, 6, 1))-1 ELSE 0 END AS b2,
      |    CASE WHEN n_bytes > 3 THEN (strpos('0123456789ABCDEF', substr(h, 7, 1))-1)*16
      |      + strpos('0123456789ABCDEF', substr(h, 8, 1))-1 ELSE 0 END AS b3
      |  FROM hx)
      |SELECT CASE b3 % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS format,
      |  count(*) AS n,
      |  CAST(sum((b0 * 7) % 512 + 1) AS BIGINT) AS sum_width,
      |  CAST(sum((b1 * 13) % 512 + 1) AS BIGINT) AS sum_height,
      |  CAST(sum(b2 % 3 + 1) AS BIGINT) AS sum_channels,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(sum(b0) AS BIGINT) AS sum_f0_x255
      |FROM hdr
      |GROUP BY 1
      |ORDER BY format""".stripMargin

  /** Frame-sampling pass (the video path): every 32nd BYTE offset becomes a
    * 16-byte "frame"; per media, the frame count and a first-byte checksum —
    * the shape of sample-then-featurize over an opaque stream, with the
    * same mapPartitions batching as the decode pass. The oracle replays the
    * identical byte-stride arithmetic via `hex(encode(text))` (see
    * [[hMultimodalDecodeSql]]), so both sides agree on any corpus — the
    * round-5 ASCII-only equivalence trap is gone. */
  def hMultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id").cast("long"), encode(col("text"), "UTF-8").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, content) =>
        val frames = frameSampleStub(content, 32)
        val checksum = frames.iterator
          .map(f => if (f.nonEmpty) (f(0) & 0xff).toLong else 0L).sum
        (id, frames.length.toLong, checksum)
      })
      .toDF("media_id", "n_frames", "first_byte_sum")
      .orderBy(col("media_id"))
  }

  val hMultimodalFramesSql: String =
    """WITH hx AS (
      |  SELECT doc_id, hex(encode(text)) AS h,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents WHERE doc_id < 200),
      |fr AS (
      |  SELECT doc_id,
      |    list_transform(range(0, nb, 32),
      |      o -> (strpos('0123456789ABCDEF', substr(h, CAST(2*o+1 AS BIGINT), 1))-1)*16
      |         + strpos('0123456789ABCDEF', substr(h, CAST(2*o+2 AS BIGINT), 1))-1) AS firsts
      |  FROM hx)
      |SELECT doc_id AS media_id,
      |  CAST(len(firsts) AS BIGINT) AS n_frames,
      |  CAST(coalesce(list_sum(firsts), 0) AS BIGINT) AS first_byte_sum
      |FROM fr
      |ORDER BY media_id""".stripMargin

  /** STUB resize: aspect-preserving fit into 256×256 in pure integer
    * arithmetic (`w*256 div max(w,h)`) — the planning half of a real
    * resize (target geometry), with the pixel work stubbed out like the
    * codecs. */
  def resizeStub(width: Int, height: Int): (Int, Int) = {
    val m = math.max(width, height)
    if (m <= 256) (width, height) else (width * 256 / m, height * 256 / m)
  }

  /** Resize pass: decode headers → target geometry per media → per-format
    * profile (how much a 256×256 normalization shrinks the corpus). Same
    * mapPartitions batching; all arithmetic integer-exact cross-engine. */
  def hMultimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("content"))
    decodeAll(s, payloads)
      .mapPartitions(_.map { r =>
        val (tw, th) = resizeStub(r.width, r.height)
        (r.format, r.width.toLong * r.height, tw.toLong * th, if (tw < r.width) 1L else 0L)
      })
      .toDF("format", "src_px", "dst_px", "downscaled")
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("src_px")).as("total_src_px"),
        sum(col("dst_px")).as("total_dst_px"),
        sum(col("downscaled")).as("n_downscaled"))
      .orderBy(col("format"))
  }

  /** Oracle replays header decode (bytes 0/1/3 via hex arithmetic, see
    * [[hMultimodalDecodeSql]]) and the integer resize. */
  val hMultimodalResizeSql: String =
    """WITH hx AS (
      |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n_bytes
      |  FROM documents),
      |hdr AS (
      |  SELECT doc_id,
      |    CASE WHEN n_bytes > 0 THEN (strpos('0123456789ABCDEF', substr(h, 1, 1))-1)*16
      |      + strpos('0123456789ABCDEF', substr(h, 2, 1))-1 ELSE 0 END AS b0,
      |    CASE WHEN n_bytes > 1 THEN (strpos('0123456789ABCDEF', substr(h, 3, 1))-1)*16
      |      + strpos('0123456789ABCDEF', substr(h, 4, 1))-1 ELSE 0 END AS b1,
      |    CASE WHEN n_bytes > 3 THEN (strpos('0123456789ABCDEF', substr(h, 7, 1))-1)*16
      |      + strpos('0123456789ABCDEF', substr(h, 8, 1))-1 ELSE 0 END AS b3
      |  FROM hx),
      |dims AS (
      |  SELECT CASE b3 % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS format,
      |    (b0 * 7) % 512 + 1 AS w, (b1 * 13) % 512 + 1 AS hgt
      |  FROM hdr),
      |rs AS (
      |  SELECT format, w, hgt, greatest(w, hgt) AS m,
      |    CASE WHEN greatest(w, hgt) <= 256 THEN w ELSE w * 256 // greatest(w, hgt) END AS tw,
      |    CASE WHEN greatest(w, hgt) <= 256 THEN hgt ELSE hgt * 256 // greatest(w, hgt) END AS th
      |  FROM dims)
      |SELECT format, count(*) AS n,
      |  CAST(sum(CAST(w AS BIGINT) * hgt) AS BIGINT) AS total_src_px,
      |  CAST(sum(CAST(tw AS BIGINT) * th) AS BIGINT) AS total_dst_px,
      |  CAST(sum(CASE WHEN tw < w THEN 1 ELSE 0 END) AS BIGINT) AS n_downscaled
      |FROM rs GROUP BY format ORDER BY format""".stripMargin

  /** Feature-extraction pass: the decoded 16-dim feature vector (the stub
    * stand-in for a vision-encoder embedding) profiled per format — L1
    * mass recovered as exact integers (`round(f*255)` inverts the
    * normalization per component before any summation, so no float
    * accumulation order can diverge) plus a brightness flag. These vectors
    * feed the [[LlmOps]] ANN path unchanged; this query is the
    * extraction-stage contract. */
  def hMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("content"))
    decodeAll(s, payloads)
      .mapPartitions(_.map { r =>
        val l1 = r.features.iterator.map(f => math.round(f * 255f).toLong).sum
        (r.format, l1, if (l1 > 1800L) 1L else 0L)
      })
      .toDF("format", "l1_x255", "bright")
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l1_x255")).as("sum_l1_x255"),
        sum(col("bright")).as("n_bright"))
      .orderBy(col("format"))
  }

  /** Oracle decodes all 16 feature bytes generically via a hex-arithmetic
    * list comprehension — byte k of the UTF-8 payload, exactly the Spark
    * side's `content(k) & 0xff`. */
  val hMultimodalFeaturesSql: String =
    """WITH hx AS (
      |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n_bytes
      |  FROM documents),
      |fv AS (
      |  SELECT doc_id,
      |    CASE WHEN n_bytes > 3 THEN (strpos('0123456789ABCDEF', substr(h, 7, 1))-1)*16
      |      + strpos('0123456789ABCDEF', substr(h, 8, 1))-1 ELSE 0 END AS b3,
      |    list_sum(list_transform(range(16), k ->
      |      CASE WHEN n_bytes > k THEN
      |        (strpos('0123456789ABCDEF', substr(h, CAST(2*k+1 AS BIGINT), 1))-1)*16
      |        + strpos('0123456789ABCDEF', substr(h, CAST(2*k+2 AS BIGINT), 1))-1
      |      ELSE 0 END)) AS l1
      |  FROM hx)
      |SELECT CASE b3 % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS format,
      |  count(*) AS n,
      |  CAST(sum(l1) AS BIGINT) AS sum_l1_x255,
      |  CAST(sum(CASE WHEN l1 > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright
      |FROM fv GROUP BY 1 ORDER BY format""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h_multimodal_decode" -> (hMultimodalDecode _),
    "h_multimodal_frames" -> (hMultimodalFrames _),
    "h_multimodal_resize" -> (hMultimodalResize _),
    "h_multimodal_features" -> (hMultimodalFeatures _)
  )

  def oracle: Map[String, String] = Map(
    "h_multimodal_decode" -> hMultimodalDecodeSql,
    "h_multimodal_frames" -> hMultimodalFramesSql,
    "h_multimodal_resize" -> hMultimodalResizeSql,
    "h_multimodal_features" -> hMultimodalFeaturesSql
  )
}
