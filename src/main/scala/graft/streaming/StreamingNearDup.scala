package graft.streaming

import graft.ingest.Doc
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (doc, LSH band bucket) membership row. */
final case class BucketMember(doc_id: String, bucket: Long)

/** A near-duplicate candidate pair (id1 < id2). */
final case class CandidatePair(id1: String, id2: String)

/** Streaming near-duplicate detection: continuous MinHash/LSH across
  * micro-batches. The batch recipe ([[graft.ops.Dedup
  * .lshCandidatePairsFast]]) needs the whole corpus per run; this
  * operator emits candidate pairs INCREMENTALLY as documents arrive —
  * the shape a continuously-fed training-data pipeline needs.
  *
  * Dataflow: signatures compute narrowly per document at scan speed
  * (the [[graft.expr.MinHashOf]] kernel — no explode, no shuffle); each
  * document emits its band-bucket keys (same xxhash64 banding math as
  * the batch recipe, so bucket membership is identical); ONE stateful
  * shuffle keys by bucket, where per-bucket state holds the (capped)
  * member ids seen so far and each arriving member emits pairs against
  * them plus the earlier arrivals of its own batch.
  *
  * Semantics vs the batch recipe: the emitted pair SET over all
  * micro-batches equals the batch pair set over the union of the
  * batches (pinned by StreamingSpec), with two documented deltas —
  * (1) a pair that shares BOTH bands is emitted once per shared bucket
  * (the batch form ends in `distinct()`); dedup downstream or in the
  * consumer, exactly like the batch verify stage would; (2) the
  * per-bucket cap admits the first `maxBucket` members by ARRIVAL
  * (batch: first by global id order) — deterministic given the batch
  * contents because each batch's arrivals are processed in id order.
  *
  * Scale: state per bucket is at most `maxBucket` ids; buckets
  * hash-partition across executors. Pair with the RocksDB configs
  * ([[StreamingDedup.rocksDbStateStoreConfigs]]) for corpus-scale
  * bucket counts, and a TTL variant of the state (same re-arm pattern
  * as [[StreamingDedup.firstSeenTtl]]) for infinite streams where the
  * dedup horizon is bounded.
  */
object StreamingNearDup {

  /** Per-bucket stateful pair expansion (Append mode, no timeout —
    * AvailableNow backfills self-terminate). `numeric`: compare ids
    * under the NATIVE ordering ([[StreamingUtil.idCompare]]) — both
    * the in-batch cap/order and the (id1 < id2) pair orientation must
    * match the batch recipe's typed `array_sort`, or numeric-id
    * corpora emit ("10","9")-style inverted pairs.
    */
  def pairsInBucket(maxBucket: Int, numeric: Boolean = false)(
      bucket: Long, rows: Iterator[BucketMember],
      state: GroupState[Seq[String]]): Iterator[CandidatePair] = {
    val existing: Vector[String] =
      if (state.exists) state.get.toVector else Vector.empty
    val seen = existing.toSet
    val idOrd = StreamingUtil.IdOrdering(numeric)
    // native id order within the batch -> deterministic output and cap
    val newIds = rows.map(_.doc_id).toVector.distinct.sorted(idOrd)
      .filterNot(seen)
    val out = Vector.newBuilder[CandidatePair]
    var members = existing
    for (id <- newIds if members.size < maxBucket) {
      for (m <- members)
        out += (if (idOrd.lt(m, id)) CandidatePair(m, id) else CandidatePair(id, m))
      members = members :+ id
    }
    if (members.size != existing.size) state.update(members)
    out.result().iterator
  }

  /** Shared narrow prefix of both operators: signatures + banding +
    * bucket membership, identical math to the batch recipe.
    */
  private def bucketMembers(docs: DataFrame, k: Int, bands: Int,
                            shingleN: Int): Dataset[BucketMember] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sig = docs.select(col("doc_id"),
      graft.expr.MinHashOf(col("text"), shingleN, k).as("sigs"))
    val bandCols = (0 until bands).map { b =>
      xxhash64((lit(b) +: (b * rows until (b + 1) * rows)
        .map(j => col("sigs").getItem(j))): _*)
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bucket"))
      .as[BucketMember]
  }

  private def isNumeric(docs: DataFrame): Boolean =
    StreamingUtil.isNumericId(docs.schema("doc_id").dataType)

  /** Core operator over (doc_id, text) columns — works for both batch
    * and streaming DataFrames. Same k/bands/shingleN/banding math as
    * [[graft.ops.Dedup.lshCandidatePairsFast]].
    */
  def candidatePairs(docs: DataFrame, k: Int = 8, bands: Int = 2,
                     shingleN: Int = 3, maxBucket: Int = 1024): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bucketMembers(docs, k, bands, shingleN).groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(pairsInBucket(maxBucket, isNumeric(docs)))
  }

  /** TTL'd per-bucket state: a bucket's member list expires `ttlMs`
    * after the bucket was last touched (re-armed on every data
    * invocation — Spark cancels a key's timeout when the function runs
    * with data) and is swept at a later micro-batch. Bounds state to
    * the dedup horizon for infinite streams; pairs only form within
    * the horizon.
    */
  def pairsInBucketTtl(maxBucket: Int, ttlMs: Long, numeric: Boolean = false)(
      bucket: Long, rows: Iterator[BucketMember],
      state: GroupState[Seq[String]]): Iterator[CandidatePair] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val out = pairsInBucket(maxBucket, numeric)(bucket, rows, state)
      if (state.exists) state.setTimeoutDuration(ttlMs)
      out
    }

  /** [[candidatePairs]] with bounded per-bucket state (processing-time
    * TTL). Timeout-carrying state keeps scheduling micro-batches, so
    * drive bounded backfills with `processAllAvailable()` + `stop()`
    * rather than AvailableNow (see [[StreamingDedup.dedupStreamTtl]]).
    */
  def candidatePairsTtl(docs: DataFrame, ttlMs: Long, k: Int = 8,
                        bands: Int = 2, shingleN: Int = 3,
                        maxBucket: Int = 1024): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bucketMembers(docs, k, bands, shingleN).groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        pairsInBucketTtl(maxBucket, ttlMs, isNumeric(docs)))
  }

  /** [[candidatePairs]] over span-docs: text = reconstructed spans
    * (narrow typed map; media spans never reach the hash).
    */
  def candidatePairsFromDocs(docs: Dataset[Doc], k: Int = 8, bands: Int = 2,
                             shingleN: Int = 3, maxBucket: Int = 1024): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    candidatePairs(
      docs.map(d => (d.doc_id, graft.ingest.SpanCodec.reconstruct(d.spans)))
        .toDF("doc_id", "text"),
      k, bands, shingleN, maxBucket)
  }
}
