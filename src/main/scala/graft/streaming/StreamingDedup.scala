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

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

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

  /** Streaming Dataset[Doc] -> deduplicated streaming Dataset[Doc]. */
  def dedupStream(docs: Dataset[Doc]): Dataset[Doc] = {
    implicit val docEnc = Encoders.product[Doc]
    implicit val strEnc = Encoders.STRING
    implicit val boolEnc = Encoders.scalaBoolean
    docs.groupByKey(contentKey _)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(firstSeen)
  }
}
