package graft.streaming

import graft.ingest.Doc
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming exact-dedup: across ALL micro-batches, emit only
  * the first document carrying each content hash (first = smallest
  * doc_id within the batch that first sees the hash — deterministic
  * under retries). State is one boolean per content hash, managed by
  * `flatMapGroupsWithState` and persisted in the checkpoint, so dedup
  * survives restarts (pinned by StreamingDedupSpec across two
  * AvailableNow runs sharing a checkpoint).
  *
  * Scale: state is hash-partitioned across executors by the groupByKey
  * shuffle; per-key state is 1 bit + key. For bounded state on infinite
  * streams swap NoTimeout for ProcessingTimeTimeout and re-admit after
  * expiry (at 10^12 docs the md5 keyspace itself is the dominant cost —
  * RocksDB state store recommended).
  */
object StreamingDedup {

  private def md5hex(s: String): String = StreamingUtil.md5hex(s)

  def contentKey(d: Doc): String =
    md5hex(graft.ingest.SpanCodec.reconstruct(d.spans))

  def firstSeen(key: String, docs: Iterator[Doc],
                state: GroupState[Boolean]): Iterator[Doc] =
    if (state.exists) Iterator.empty
    else {
      state.update(true)
      if (docs.isEmpty) Iterator.empty
      else Iterator(docs.reduceLeft((a, b) => if (a.doc_id <= b.doc_id) a else b))
    }

  /** Streaming Dataset[Doc] -> deduplicated streaming Dataset[Doc].
    * Unbounded state (every content hash ever seen) — correct for
    * bounded backfills; for infinite streams use [[dedupStreamTtl]].
    */
  def dedupStream(docs: Dataset[Doc]): Dataset[Doc] = {
    implicit val docEnc = Encoders.product[Doc]
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    docs.groupByKey(contentKey _)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(firstSeen)
  }

  /** TTL'd first-seen: a hash's state expires `ttlMs` after it was LAST
    * SEEN (processing time; Spark cancels a key's timeout on every
    * invocation with data, so the suppress path must re-arm it — the
    * TTL is therefore a sliding last-seen horizon) and is removed at a
    * later micro-batch's timeout sweep — a duplicate arriving after
    * expiry is RE-ADMITTED. This bounds state to the hashes seen within
    * the TTL window, the deployable shape for an infinite stream;
    * exact forever-dedup at 10^12 docs belongs to the batch resume
    * path, not executor state.
    */
  def firstSeenTtl(ttlMs: Long)(key: String, docs: Iterator[Doc],
                                state: GroupState[Boolean]): Iterator[Doc] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else if (state.exists) {
      state.setTimeoutDuration(ttlMs) // re-arm: invocation cleared it
      Iterator.empty // within TTL: suppress duplicate
    } else {
      state.update(true)
      state.setTimeoutDuration(ttlMs)
      if (docs.isEmpty) Iterator.empty
      else Iterator(docs.reduceLeft((a, b) => if (a.doc_id <= b.doc_id) a else b))
    }

  /** [[dedupStream]] with bounded state: admissions expire after
    * `ttlMs` of processing time. Pair with [[rocksDbStateStoreConfigs]]
    * when the in-window hash set exceeds executor heap.
    *
    * Trigger note: with ProcessingTimeTimeout the engine schedules
    * EXTRA micro-batches to fire pending timeouts, so under
    * `Trigger.AvailableNow` the query does not self-terminate while
    * any state is live — drive bounded backfills with
    * `processAllAvailable()` + `stop()` (or use [[dedupStream]], whose
    * NoTimeout state schedules no extra batches); continuous
    * deployments under a processing-time trigger are unaffected.
    */
  def dedupStreamTtl(docs: Dataset[Doc], ttlMs: Long): Dataset[Doc] = {
    implicit val docEnc = Encoders.product[Doc]
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    docs.groupByKey(contentKey _)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(firstSeenTtl(ttlMs))
  }

  /** Session configs that move flatMapGroupsWithState state off-heap
    * into RocksDB (disk-backed, incremental checkpoints) — required
    * once the in-window hash set stops fitting executor memory.
    */
  val rocksDbStateStoreConfigs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
}
