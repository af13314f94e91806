package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition (the Scala analogue of
  * `mapInPandas`: one iterator of rows in, one out, vectorizable per
  * batch).
  *
  * The decode step itself is a STUB — media codecs are not available in
  * this environment — but the Spark-side contract (schema, batching,
  * partitioning, deterministic fake features) is real and tested. At
  * 100 TB the shape matters: payloads never pass through a shuffle (all
  * transforms narrow), and feature extraction cost is bounded per batch.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sig", StringType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** REAL header decode — pure-JVM parse of the PNG / GIF / JPEG / BMP
    * container headers (magic, dimensions, bit depth) straight from the
    * payload bytes; no codecs needed. Returns None for unrecognized or
    * truncated payloads. This is the actual metadata-extraction step of
    * the multimodal column; only the pixel-level FEATURE stage below
    * ([[stubDecode]]) remains a deterministic fake (no codec libraries
    * in this environment).
    *
    * Formats: PNG (8-byte signature + IHDR: big-endian w/h, depth byte);
    * GIF87a/89a (little-endian w/h, depth = (packed & 7) + 1); JPEG
    * (segment scan to the first SOFn marker: big-endian h/w, precision
    * byte); BMP (BITMAPINFOHEADER little-endian w/h, bpp).
    */
  def headerDecode(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def be16(i: Int) = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def be32(i: Int) = ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    def le16(i: Int) = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def le32(i: Int) = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    val n = b.length
    if (n >= 25 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A &&
        b(7) == 0x0A && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(16), be32(20), b(24) & 0xFF))
    else if (n >= 11 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("gif", le16(6), le16(8), ((b(10) & 7) + 1)))
    else if (n >= 4 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) {
      // JPEG: walk segments to the first start-of-frame marker
      var i = 2
      while (i + 3 < n && b(i) == 0xFF.toByte) {
        val m = b(i + 1) & 0xFF
        if (m == 0xFF) i += 1 // fill byte
        else if ((m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          return if (i + 8 < n)
            Some(("jpeg", be16(i + 7), be16(i + 5), b(i + 4) & 0xFF)) else None
        } else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2
        else if (i + 3 < n) i += 2 + be16(i + 2)
        else return None
      }
      None
    } else if (n >= 30 && b(0) == 'B' && b(1) == 'M')
      Some(("bmp", le32(18), math.abs(le32(22)), le16(28)))
    else None
  }

  /** [[headerDecode]] as a Catalyst InternalRow (null when unrecognized)
    * — the codegen target of [[graft.expr.MediaHeaderOf]].
    */
  def headerRow(payload: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    headerDecode(payload) match {
      case Some((fmt, w, h, d)) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(fmt), w, h, d))
      case None => null
    }

  /** STUB feature extraction: a real deployment would decode pixels with
    * an image/audio codec here (per partition, batched). This
    * deterministic fake derives an 8-dim "feature vector" from payload
    * bytes so the plumbing is testable end-to-end — header METADATA
    * extraction is real, see [[headerDecode]].
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction over media rows. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val rows: Dataset[Row] = media.select("media_id", "kind", "payload")
    implicit val enc = org.apache.spark.sql.Encoders.row(FeatureSchema)
    rows.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        md.reset()
        Row(r.getString(0), r.getString(1), payload.length.toLong,
          md.digest(payload).map(b => f"$b%02x").mkString,
          stubDecode(payload))
      }
    }
  }

  /** Deterministic frame sampling for video payloads: byte offsets of k
    * evenly spaced "frames" (stub for a real frame decoder).
    */
  def frameOffsets(media: DataFrame, k: Int): DataFrame =
    media.withColumn("frame_offsets",
      expr(s"transform(sequence(0, ${k - 1}), i -> cast(i * length(payload) / $k as bigint))"))

  /** Build a media table from the docs table's media spans. */
  def fromMediaSpans(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media")
      .select(
        concat(col("doc_id"), lit("#"), col("s.offset")).as("media_id"),
        lit("image").as("kind"),
        encode(col("s.media_ref"), "UTF-8").as("payload"), // stub payload
        struct(lit("application/octet-stream").as("mime"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("bigint").as("duration_ms")).as("meta"))
}
