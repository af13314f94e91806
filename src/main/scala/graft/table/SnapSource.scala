package graft.table

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `readStream.format("graft-snap")` — the [[SnapTable.changesBetween]]
  * polling consumer as a first-class Structured Streaming source, so an
  * incremental pipeline over a SnapTable needs no hand-rolled cursor
  * loop: offsets ARE snapshot ids, checkpointed by the engine.
  *
  *   spark.readStream.format("graft-snap").option("path", root).load()
  *
  * Semantics, inherited from the table's commit protocol:
  *  - a micro-batch (start, end] reads exactly the rows ADDED by
  *    append/overwrite commits in that snapshot-id range — each row is
  *    delivered exactly once per the engine's offset log;
  *  - compactions ([[SnapTable.rewrite]]) add files but no rows, so
  *    they are invisible to the stream (no double-delivery of
  *    compacted data);
  *  - a torn manifest at the head (an in-flight writer on a
  *    non-atomic-rename filesystem) is simply not offered as an offset
  *    yet — [[SnapTable.snapshot]] resolves the latest PARSEABLE id;
  *  - a checkpoint that has fallen behind [[SnapTable.expire]] fails
  *    LOUDLY ("re-sync with a full read()") instead of silently
  *    skipping expired lineage — the same guard as `changesBetween`.
  *
  * The analogue of Spark's own FileStreamSource, re-expressed over
  * snapshot lineage instead of directory listings: `getBatch` returns a
  * plain parquet scan of the added files, so column pruning and filter
  * pushdown reach the files exactly as in batch reads.
  */
class SnapSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snap"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snap source requires .option(\"path\", <table root>)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val spark = sqlContext.sparkSession
      SnapTable.read(spark, root(parameters)).schema
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new SnapSource(sqlContext, root(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2)
}

class SnapSource(sqlContext: SQLContext, root: String,
                 override val schema: StructType) extends Source {

  private def spark = sqlContext.sparkSession

  /** Latest committed (parseable) snapshot id; None = nothing yet. */
  override def getOffset: Option[OffsetV1] =
    SnapTable.snapshot(spark, root).map(s => LongOffset(s.id))

  // LongOffset in-session; the engine replays checkpointed offsets as
  // SerializedOffset, whose json is the same long
  private def id(o: OffsetV1): Long = o.json.trim.toLong

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(id).getOrElse(0L)
    val changes = SnapTable.changesBetween(spark, root, from, Some(id(end)))
    // the engine requires isStreaming=true on the returned frame — the
    // FileStreamSource re-tagging pattern, via the graftbridge shim
    changes.rows match {
      case Some(df) => org.apache.spark.sql.graftbridge.StreamingFrame.asStreaming(df)
      case None =>
        org.apache.spark.sql.graftbridge.StreamingFrame.emptyStreaming(spark, schema)
    }
  }

  override def stop(): Unit = ()
}
