package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest paths into the docs table (reference S1/S2: fetch + decode is
  * an ingest-time concern; the pipeline consumes decoded spans).
  */
object Ingest {

  /** CSV files on disk -> Dataset[Doc] via the binaryFile source
    * (distributed read; doc_id = file name). `charset = "auto"` runs the
    * per-file [[EncodingSniff]] detection kernel (the reference's
    * chardet path, annotator.py:361-372); a concrete charset pins it.
    */
  def fromCsvFiles(spark: SparkSession, pathGlob: String,
                   charset: String = "auto"): Dataset[Doc] = {
    import spark.implicits._
    fromCsvFilesDetected(spark, pathGlob, charset).map(_._1)
  }

  /** Like [[fromCsvFiles]] but keeps the (detected or pinned) encoding
    * label alongside each doc — the label lands in the metadata dialect
    * (Annotator needs it), so at scale it must travel with the row, not
    * through a driver-side map.
    */
  def fromCsvFilesDetected(spark: SparkSession, pathGlob: String,
                           charset: String = "auto"): Dataset[(Doc, String)] = {
    import spark.implicits._
    val cs = charset
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val enc = if (cs == "auto") EncodingSniff.detect(bytes) else cs
        (SpanCodec.encode(name, EncodingSniff.decode(bytes, enc)), enc)
      }
  }

  /** A (id, text) table -> Dataset[Doc]. */
  def fromTextTable(df: DataFrame, idCol: String, textCol: String,
                    idPrefix: String = ""): Dataset[Doc] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("string"), col(textCol))
      .as[(String, String)]
      .map { case (id, text) => SpanCodec.encode(idPrefix + id, text) }
  }

  /** JSONL corpus files (one JSON object per line — the standard raw
    * shape for LLM training corpora) -> Dataset[Doc]. A fixed two-field
    * schema is supplied so the reader never runs its sampling
    * inference pass over 100 TB, splits line-by-line, and transparently
    * handles gzip/zstd-compressed parts. Rows with a missing/null id or
    * text are dropped (corrupt lines land in neither field under the
    * default PERMISSIVE mode).
    */
  def fromJsonl(spark: SparkSession, pathGlob: String,
                idField: String = "id", textField: String = "text",
                idPrefix: String = ""): Dataset[Doc] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idField,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(textField,
        org.apache.spark.sql.types.StringType)))
    val raw = spark.read.schema(schema).json(pathGlob)
      .filter(col(idField).isNotNull && col(textField).isNotNull)
    fromTextTable(raw, idField, textField, idPrefix)
  }
}
