package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental global line-level dedup (the streaming form of
  * [[graft.ops.Dedup.dedupLinesGlobal]] — the CCNet boilerplate pass
  * run continuously): across all micro-batches, each eligible line
  * survives only at its first-seen occurrence; within the batch that
  * first sees a line, the smallest (doc_id, idx) wins — so over
  * doc-ordered batches the kept set equals the batch rule exactly
  * (pinned by StreamingSpec across two checkpointed runs). Lines
  * shorter than `minLen` bypass state entirely: they are always kept
  * and never shuffled into a hot key group — the same skew rule as the
  * batch operator.
  *
  * Scale: one groupByKey shuffle on the 32-hex line hash; state is one
  * boolean per distinct eligible line, RocksDB-backed when it outgrows
  * executor heap ([[StreamingDedup.rocksDbStateStoreConfigs]]).
  */
object StreamingLineDedup {

  case class LineRow(doc_id: String, idx: Int, line: String)

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def firstOf(rows: Iterator[LineRow]): Iterator[LineRow] =
    if (rows.isEmpty) Iterator.empty
    else Iterator(rows.reduceLeft { (a, b) =>
      if (a.doc_id < b.doc_id || (a.doc_id == b.doc_id && a.idx <= b.idx)) a else b
    })

  def firstLine(key: String, rows: Iterator[LineRow],
                state: GroupState[Boolean]): Iterator[LineRow] =
    if (state.exists) Iterator.empty
    else { state.update(true); firstOf(rows) }

  /** TTL'd variant: a line's claim expires `ttlMs` after it was last
    * seen (sliding last-seen horizon, same re-arm rule as
    * [[StreamingDedup.firstSeenTtl]]); a boilerplate line recurring
    * after expiry is re-admitted once. Bounded state for infinite
    * streams.
    */
  def firstLineTtl(ttlMs: Long)(key: String, rows: Iterator[LineRow],
                                state: GroupState[Boolean]): Iterator[LineRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else if (state.exists) { state.setTimeoutDuration(ttlMs); Iterator.empty }
    else {
      state.update(true)
      state.setTimeoutDuration(ttlMs)
      firstOf(rows)
    }

  private def lines(docs: DataFrame, textCol: String): Dataset[LineRow] = {
    implicit val enc = Encoders.product[LineRow]
    docs.select(col("doc_id").cast("string").as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "line")))
      .as[LineRow]
  }

  /** Streaming docs (doc_id, text) -> streaming kept lines
    * (doc_id, idx, line). Append mode; state unbounded (bounded
    * backfills) — see [[keptLinesTtl]] for the infinite-stream shape.
    */
  def keptLines(docs: DataFrame, textCol: String = "text",
                minLen: Int = 5): Dataset[LineRow] = {
    implicit val enc = Encoders.product[LineRow]
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    val l = lines(docs, textCol)
    val kept = l.filter(_.line.length >= minLen)
      .groupByKey(r => md5hex(r.line))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(firstLine)
    kept.union(l.filter(_.line.length < minLen))
  }

  /** [[keptLines]] with TTL-bounded state (ProcessingTimeTimeout: the
    * engine schedules extra batches for pending timeouts — drive with
    * a processing-time trigger + stop(), not AvailableNow).
    */
  def keptLinesTtl(docs: DataFrame, ttlMs: Long, textCol: String = "text",
                   minLen: Int = 5): Dataset[LineRow] = {
    implicit val enc = Encoders.product[LineRow]
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    val l = lines(docs, textCol)
    val kept = l.filter(_.line.length >= minLen)
      .groupByKey(r => md5hex(r.line))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(firstLineTtl(ttlMs))
    kept.union(l.filter(_.line.length < minLen))
  }
}
