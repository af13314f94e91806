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

  /** STUB decode: a real deployment would decode the payload with an
    * image/audio codec here (per partition, batched). This deterministic
    * fake derives an 8-dim "feature vector" from payload bytes so the
    * plumbing is testable end-to-end.
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
