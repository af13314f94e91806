package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest paths into the docs table (reference S1/S2: fetch + decode is
  * an ingest-time concern; the pipeline consumes decoded spans).
  */
object Ingest {

  /** CSV files on disk -> Dataset[Doc] via the binaryFile source
    * (distributed read; doc_id = file name, bytes decoded with the given
    * charset — plug a charset-detection pass here if inputs are mixed).
    */
  def fromCsvFiles(spark: SparkSession, pathGlob: String,
                   charset: String = "UTF-8"): Dataset[Doc] = {
    import spark.implicits._
    val cs = charset
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        SpanCodec.encode(name, new String(bytes,
          java.nio.charset.Charset.forName(if (cs == "latin-1") "ISO-8859-1" else cs)))
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
}
