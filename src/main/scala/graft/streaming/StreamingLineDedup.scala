package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental global line-level dedup (the streaming form of
  * [[graft.ops.Dedup.dedupLinesGlobal]] — the CCNet boilerplate pass
  * run continuously): across all micro-batches, each eligible line
  * survives only at its first-seen occurrence; within the batch that
  * first sees a line, the smallest (doc_id, idx) wins UNDER THE
  * NATIVE id ordering (numeric ids compare numerically, matching the
  * batch window's `orderBy(idCol)` on the typed column) — so over
  * doc-ordered batches the kept set equals the batch rule exactly
  * (pinned by StreamingSpec across two checkpointed runs, and for
  * same-batch numeric-id ties). Lines shorter than `minLen`
  * codepoints (Spark `length()` semantics, not UTF-16 units) bypass
  * state entirely: they are always kept and never shuffled into a hot
  * key group — the same skew rule as the batch operator.
  *
  * Scale: one groupByKey shuffle on the 32-hex line hash; state is one
  * boolean per distinct eligible line, RocksDB-backed when it outgrows
  * executor heap ([[StreamingDedup.rocksDbStateStoreConfigs]]).
  */
object StreamingLineDedup {

  case class LineRow(doc_id: String, idx: Int, line: String)

  /** In-batch tie-break ordering on the stringified doc id, matching
    * the BATCH rule's window order on the NATIVE id type (see
    * [[StreamingUtil.idCompare]]: numeric — incl. decimal/float —
    * by value, strings lexicographically, nulls first). Chosen from
    * the input schema in [[keptLines]]; serializable so the closure
    * ships clean.
    */
  final case class IdOrder(numeric: Boolean) extends Ordering[LineRow] {
    def compare(a: LineRow, b: LineRow): Int = {
      val c = StreamingUtil.idCompare(numeric, a.doc_id, b.doc_id)
      if (c != 0) c else Integer.compare(a.idx, b.idx)
    }
  }
  /** Lexicographic default (string ids). */
  val LexOrder: Ordering[LineRow] = IdOrder(numeric = false)

  private def orderFor(df: DataFrame): Ordering[LineRow] =
    IdOrder(StreamingUtil.isNumericId(df.schema("doc_id").dataType))

  private def md5hex(s: String): String = StreamingUtil.md5hex(s)

  /** Codepoint count — the batch eligibility rule uses Spark
    * `length()` (codepoints), not UTF-16 units; astral chars near the
    * threshold must classify identically in both engines.
    */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  private def firstOf(ord: Ordering[LineRow], rows: Iterator[LineRow]): Iterator[LineRow] =
    if (rows.isEmpty) Iterator.empty
    else Iterator(rows.reduceLeft((a, b) => if (ord.lteq(a, b)) a else b))

  def firstLine(ord: Ordering[LineRow])(key: String, rows: Iterator[LineRow],
                state: GroupState[Boolean]): Iterator[LineRow] =
    if (state.exists) Iterator.empty
    else { state.update(true); firstOf(ord, rows) }

  /** TTL'd variant: a line's claim expires `ttlMs` after it was last
    * seen (sliding last-seen horizon, same re-arm rule as
    * [[StreamingDedup.firstSeenTtl]]); a boilerplate line recurring
    * after expiry is re-admitted once. Bounded state for infinite
    * streams.
    */
  def firstLineTtl(ttlMs: Long, ord: Ordering[LineRow] = LexOrder)(
      key: String, rows: Iterator[LineRow],
      state: GroupState[Boolean]): Iterator[LineRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else if (state.exists) { state.setTimeoutDuration(ttlMs); Iterator.empty }
    else {
      state.update(true)
      state.setTimeoutDuration(ttlMs)
      firstOf(ord, rows)
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
    val ord = orderFor(docs)
    val l = lines(docs, textCol)
    val kept = l.filter(r => cpLen(r.line) >= minLen)
      .groupByKey(r => md5hex(r.line))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(firstLine(ord))
    kept.union(l.filter(r => cpLen(r.line) < minLen))
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
    val ord = orderFor(docs)
    val l = lines(docs, textCol)
    val kept = l.filter(r => cpLen(r.line) >= minLen)
      .groupByKey(r => md5hex(r.line))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(firstLineTtl(ttlMs, ord))
    kept.union(l.filter(r => cpLen(r.line) < minLen))
  }
}
