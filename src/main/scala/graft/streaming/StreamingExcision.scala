package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-substring excision — the stateful form of
  * [[graft.ops.Dedup.exciseDupSpans]] (Lee et al. 2022 stage 2) run
  * continuously: across all micro-batches, the FIRST occurrence of
  * each token n-gram (smallest (doc_id, position) under the native id
  * ordering, the [[StreamingLineDedup]] rule) owns it; every later
  * occurrence is emitted as an excision decision (doc_id, i) — the
  * occurrence's start position, to be expanded to positions
  * i..i+n-1 by the consumer that rebuilds the text.
  *
  * Over doc-ordered batches the excised occurrence set equals the
  * batch operator's duplicate set exactly (pinned by StreamingSpec
  * across a checkpointed restart, including per-doc kept_md5 equality
  * after replaying the decisions).
  *
  * Scale: one groupByKey shuffle keyed by the 32-hex n-gram hash;
  * state is one boolean per distinct n-gram ever seen (RocksDB-backed
  * past executor heap; for infinite streams add a TTL as in
  * [[StreamingLineDedup.firstLineTtl]] — excision then bounds to the
  * horizon, which is also what a 10^12-doc deployment wants). Hot
  * boilerplate n-grams cost one state lookup per occurrence — the
  * stateful shuffle is the only exchange.
  */
object StreamingExcision {

  case class OccRow(doc_id: String, i: Int)
  case class Occ(doc_id: String, i: Int, ng: String)

  private def md5hex(s: String): String = StreamingUtil.md5hex(s)

  /** Ordering matching the batch min(struct(id, pos)) on the NATIVE id
    * type ([[StreamingUtil.idCompare]]: numeric incl. decimal/float by
    * value, strings lexicographic, nulls first).
    */
  private final case class OccOrder(numeric: Boolean) extends Ordering[Occ] {
    def compare(a: Occ, b: Occ): Int = {
      val c = StreamingUtil.idCompare(numeric, a.doc_id, b.doc_id)
      if (c != 0) c else Integer.compare(a.i, b.i)
    }
  }

  /** Emit every occurrence that does NOT own its n-gram: if the n-gram
    * was claimed in an earlier batch, all of this batch's occurrences
    * are duplicates; otherwise the in-batch minimum claims it and the
    * rest are duplicates.
    */
  def dupOccs(ord: Ordering[Occ])(key: String, rows: Iterator[Occ],
              state: GroupState[Boolean]): Iterator[OccRow] = {
    val all = rows.toVector
    if (state.exists) all.iterator.map(o => OccRow(o.doc_id, o.i))
    else {
      state.update(true)
      if (all.isEmpty) Iterator.empty
      else {
        val owner = all.min(ord)
        all.iterator.filter(_ != owner).map(o => OccRow(o.doc_id, o.i))
      }
    }
  }

  /** TTL'd ownership: an n-gram's claim expires `ttlMs` after it was
    * LAST SEEN (sliding horizon, the [[StreamingLineDedup.firstLineTtl]]
    * re-arm rule); a boilerplate n-gram recurring after expiry is
    * re-admitted once. Bounds state for infinite streams — the
    * deployable shape at 10^12 docs, where exact forever-ownership
    * belongs to the batch operator.
    */
  def dupOccsTtl(ttlMs: Long, ord: Ordering[Occ])(
      key: String, rows: Iterator[Occ],
      state: GroupState[Boolean]): Iterator[OccRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else if (state.exists) {
      state.setTimeoutDuration(ttlMs)
      rows.map(o => OccRow(o.doc_id, o.i))
    } else {
      val all = rows.toVector
      state.update(true)
      state.setTimeoutDuration(ttlMs)
      if (all.isEmpty) Iterator.empty
      else {
        val owner = all.min(ord)
        all.iterator.filter(_ != owner).map(o => OccRow(o.doc_id, o.i))
      }
    }

  private def orderFor(docs: DataFrame): Ordering[Occ] =
    OccOrder(StreamingUtil.isNumericId(docs.schema("doc_id").dataType))

  private def occurrences(docs: DataFrame, textCol: String, n: Int)
      : Dataset[Occ] = {
    implicit val occEnc = Encoders.product[Occ]
    // bind the tokenization ONCE — inlining split() into the expression
    // re-runs the regex up to three times per row (CollapseProject keeps
    // non-cheap multi-referenced aliases, same shape as the batch
    // Dedup.ngramOccurrences)
    docs.select(col("doc_id").cast("string").as("doc_id"),
        split(col(textCol), "\\s+").as("_ts"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""case when size(_ts) >= $n
             |  then transform(sequence(1, size(_ts) - ${n - 1}),
             |         i -> concat_ws(' ', slice(_ts, i, $n)))
             |  else array() end""".stripMargin)).as(Seq("i", "ng")))
      .as[Occ]
  }

  /** [[excisedOccurrences]] with TTL-bounded state
    * (ProcessingTimeTimeout — drive with a processing-time trigger +
    * stop(), not AvailableNow).
    */
  def excisedOccurrencesTtl(docs: DataFrame, ttlMs: Long,
                            textCol: String = "text",
                            n: Int = 8): Dataset[OccRow] = {
    require(n >= 1)
    implicit val occEnc = Encoders.product[Occ]
    implicit val outEnc = Encoders.product[OccRow]
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    val ord = orderFor(docs)
    occurrences(docs, textCol, n)
      .groupByKey(o => md5hex(o.ng))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(dupOccsTtl(ttlMs, ord))
  }

  /** Streaming docs (doc_id, textCol) -> streaming excision decisions
    * (doc_id, i): start positions of non-first n-gram occurrences.
    * Positions are 0-based token indices; the excised span is
    * i..i+n-1.
    */
  def excisedOccurrences(docs: DataFrame, textCol: String = "text",
                         n: Int = 8): Dataset[OccRow] = {
    require(n >= 1)
    implicit val occEnc = Encoders.product[Occ]
    implicit val outEnc = Encoders.product[OccRow]
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    val ord = orderFor(docs)
    occurrences(docs, textCol, n)
      .groupByKey(o => md5hex(o.ng))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(dupOccs(ord))
  }
}
