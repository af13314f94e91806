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
  * `.option("start", ...)` picks where a FRESH checkpoint begins:
  *  - `genesis` (default): replay the full append lineage from snapshot
  *    1 — exact change history, but fails loudly if [[SnapTable.expire]]
  *    has dropped early snapshots (their per-commit lineage is gone);
  *  - `snapshot`: first batch = the complete CURRENT snapshot (rewrites
  *    collapsed — content, not history), then incremental. The Delta
  *    "initial snapshot" stance, and the way to consume a table whose
  *    genesis has been expired;
  *  - `latest`: only commits after the stream starts.
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

  // the engine calls sourceSchema (analysis) then createSource on the
  // SAME provider instance with only the USER-specified schema — cache
  // the inference so stream start does one snapshot-resolve + footer
  // read, not two
  @volatile private var inferred: Option[(String, StructType)] = None

  private def tableSchema(sqlContext: SQLContext,
                          parameters: Map[String, String]): StructType = {
    val r = root(parameters)
    inferred match {
      case Some((rr, s)) if rr == r => s
      case _ =>
        val s = SnapTable.read(sqlContext.sparkSession, r).schema
        inferred = Some((r, s))
        s
    }
  }

  private def startMode(parameters: Map[String, String]): String = {
    val m = parameters.getOrElse("start", "genesis")
    require(Set("genesis", "snapshot", "latest")(m),
      s"graft-snap option start=$m — expected genesis | snapshot | latest")
    m
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    startMode(parameters) // validate at analysis, not first trigger
    (shortName(), schema.getOrElse(tableSchema(sqlContext, parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new SnapSource(sqlContext, root(parameters),
      schema.getOrElse(tableSchema(sqlContext, parameters)),
      startMode(parameters))
}

class SnapSource(sqlContext: SQLContext, root: String,
                 override val schema: StructType,
                 startMode: String) extends Source {

  import org.apache.spark.sql.graftbridge.StreamingFrame

  private def spark = sqlContext.sparkSession

  /** Latest committed (parseable) snapshot id; None = nothing yet. */
  override def getOffset: Option[OffsetV1] =
    SnapTable.snapshot(spark, root).map(s => LongOffset(s.id))

  // LongOffset in-session; the engine replays checkpointed offsets as
  // SerializedOffset, whose json is the same long
  private def id(o: OffsetV1): Long = o.json.trim.toLong

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame =
    start match {
      case Some(s) => incremental(id(s), id(end))
      case None => startMode match {
        case "latest" => StreamingFrame.emptyStreaming(spark, schema)
        case "snapshot" =>
          // resolve ONCE and scan its file list directly — read(asOf)
          // would re-list meta/ and re-read the same manifest
          SnapTable.snapshot(spark, root, Some(id(end))) match {
            case Some(snap) if snap.files.nonEmpty =>
              StreamingFrame.asStreaming(
                spark.read.parquet(snap.files.map(_.path): _*))
            case _ => // watermark-only table
              StreamingFrame.emptyStreaming(spark, schema)
          }
        case _ =>
          try incremental(0L, id(end))
          catch {
            // rewrap ONLY the expired-lineage failure with the re-sync
            // recipe; anything else (e.g. a corrupt manifest inside the
            // range) must keep its own diagnosis — calling it "expired"
            // would steer the operator at the wrong problem
            case e: IllegalArgumentException
                if e.getMessage != null && e.getMessage.contains("expired") =>
              throw new IllegalArgumentException(
                s"graft-snap: cannot replay $root from genesis — early snapshots " +
                  "were expired. Start this stream with .option(\"start\", " +
                  "\"snapshot\") (current content as the first batch) or " +
                  "\"latest\" (new commits only).", e)
          }
      }
    }

  private def incremental(from: Long, to: Long): DataFrame = {
    val changes = SnapTable.changesBetween(spark, root, from, Some(to))
    changes.rows match {
      case Some(df) => StreamingFrame.asStreaming(df)
      case None => StreamingFrame.emptyStreaming(spark, schema)
    }
  }

  override def stop(): Unit = ()
}
