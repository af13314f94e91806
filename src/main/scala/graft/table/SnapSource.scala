package graft.table

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset => OffsetV2, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
  * `.option("maxSnapshotsPerTrigger", n)` paces a long backfill: each
  * micro-batch covers at most `n` snapshot ids, via the engine's
  * admission-control contract ([[SupportsAdmissionControl]] /
  * [[ReadLimit]]) so the pacing composes with `Trigger.AvailableNow`
  * ([[SupportsTriggerAvailableNow]] pins the target head at start;
  * the engine then drains to it in paced batches and exits). The
  * `snapshot` and `latest` start modes deliver their FIRST offset
  * un-paced — the initial snapshot is one atomic batch by definition,
  * and `latest` only anchors the head.
  *
  * The analogue of Spark's own FileStreamSource, re-expressed over
  * snapshot lineage instead of directory listings: `getBatch` returns a
  * plain parquet scan of the added files, so column pruning and filter
  * pushdown reach the files exactly as in batch reads. Deliberately a
  * V1 `Source` + the V2 admission-control mixins — the exact interface
  * set of Spark's own `FileStreamSource`: Structured Streaming has no
  * DSv2 file-scan path, so a `MicroBatchStream` here would mean
  * hand-rolled parquet `PartitionReader`s that forfeit the vectorized
  * reader, pushdown, and pruning.
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

  private def maxSnapshots(parameters: Map[String, String]): Option[Int] =
    parameters.get("maxSnapshotsPerTrigger").map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft-snap option maxSnapshotsPerTrigger=$v — expected a positive int")
      }
      require(n > 0,
        s"graft-snap option maxSnapshotsPerTrigger=$n — expected a positive int")
      n
    }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    startMode(parameters) // validate at analysis, not first trigger
    maxSnapshots(parameters)
    (shortName(), schema.getOrElse(tableSchema(sqlContext, parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new SnapSource(sqlContext, root(parameters),
      schema.getOrElse(tableSchema(sqlContext, parameters)),
      startMode(parameters), maxSnapshots(parameters))
}

class SnapSource(sqlContext: SQLContext, root: String,
                 override val schema: StructType,
                 startMode: String,
                 maxSnapshotsPerTrigger: Option[Int] = None)
    extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  import org.apache.spark.sql.graftbridge.StreamingFrame

  private def spark = sqlContext.sparkSession

  /** Latest committed (parseable) snapshot id; None = nothing yet.
    * (The engine calls [[latestOffset]] instead once it sees the
    * [[SupportsAdmissionControl]] mixin; this stays for the `Source`
    * contract and direct callers.)
    */
  override def getOffset: Option[OffsetV1] =
    SnapTable.snapshot(spark, root).map(s => LongOffset(s.id))

  // LongOffset in-session; the engine replays checkpointed offsets as
  // SerializedOffset, whose json is the same long
  private def id(o: OffsetV1): Long = o.json.trim.toLong
  private def idV2(o: OffsetV2): Long = o.json.trim.toLong

  // ---- admission control (ReadLimit pacing) ----------------------------

  /** Under Trigger.AvailableNow the engine prepares, then drains to the
    * target in [[latestOffset]]-paced batches; pinning the head HERE
    * keeps commits racing the drain out of this run (they are the next
    * run's work — AvailableNow's contract). An EMPTY table at prepare
    * time pins "nothing": without the explicit marker, commits racing
    * the drain would keep extending the run and a sustained writer
    * could keep it from ever terminating.
    */
  @volatile private var availableNowTarget: Option[Option[Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(SnapTable.snapshot(spark, root).map(_.id))

  override def getDefaultReadLimit: ReadLimit =
    maxSnapshotsPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Max snapshot ids one batch may cover under `limit` ("files" =
    * snapshots here, the unit the source admits by). None = unbounded.
    */
  private def snapshotCap(limit: ReadLimit): Option[Int] = limit match {
    case f: ReadMaxFiles => Some(f.maxFiles())
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(snapshotCap).reduceOption(math.min)
    case _: ReadAllAvailable => None
    case _ => None // rows/bytes limits: snapshots are the only unit here
  }

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val head = availableNowTarget match {
      case Some(pinned) => pinned // AvailableNow: the prepared target,
      // even when it is "nothing yet" — never the live head
      case None => SnapTable.snapshot(spark, root).map(_.id)
    }
    head match {
      case None => null // nothing committed yet
      case Some(h) =>
        val end = snapshotCap(limit) match {
          case Some(n) =>
            startOffset match {
              case null =>
                // first batch: genesis pacing chunks the replay from
                // id 0; snapshot/latest first offsets are atomic (the
                // initial snapshot is ONE batch; latest only anchors)
                if (startMode == "genesis") math.min(h, n.toLong) else h
              case so => math.min(h, idV2(so) + n)
            }
          case None => h
        }
        LongOffset(end)
    }
  }

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
