package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.table.SnapTable

/** Cross-batch first-seen claim state for the streaming curation
  * funnel, one [[graft.table.SnapTable]] per claim domain (line hashes,
  * n-gram hashes, curated-text hashes). This replaces the
  * batch-partitioned parquet sidecars and closes BOTH of their
  * documented scale/crash caveats at once:
  *
  *  - **Atomic claims.** A batch's new claims commit in ONE manifest
  *    CAS, tagged `b:<batchId>` per file with the batch id as the
  *    table watermark. A replayed batch (crash between claim write and
  *    engine commit) is detected on the watermark and skips the
  *    re-append — claims are deterministic given the same inputs, so
  *    the previous attempt's commit is exactly right. The old layout's
  *    crash-window duplicate claims (partial dynamic-partition
  *    overwrites, interrupted folds) cannot happen: every state
  *    transition here is a snapshot commit. Claim sets are therefore
  *    globally DISTINCT by construction — the write path anti-joins
  *    against all earlier claims, appends are replay-skipped, and
  *    [[fold]] is a snapshot-isolated rewrite — so readers never need
  *    a defensive `.distinct()` over corpus-sized state.
  *
  *  - **Batch-bounded reads.** The old read path anti-joined each
  *    micro-batch against the FULL cumulative claim set — O(corpus)
  *    bytes per batch, tens of TB per batch at 10^12 docs. Here the
  *    per-batch read is bounded by the BATCH, not the corpus:
  *    unfolded recent batch files are read fully (bounded by
  *    `compactEvery` batches), and the folded base is probed through a
  *    Bloom filter — a batch hash that the Bloom rejects is DEFINITELY
  *    unclaimed and costs zero base bytes; the surviving positives
  *    (true duplicates + ~fpp false positives, both batch-bounded) are
  *    exact-checked against only the base chunks whose manifest
  *    [lo,hi] hash bounds contain a positive, with the `IN` filter
  *    pushed to parquet so row-group stats on the range-clustered,
  *    sorted chunks prune inside the file too. The Bloom itself is
  *    metadata-class state (~10 bits/claim, like an LSM-tree's cached
  *    filter blocks): it lives next to the table, is extended
  *    incrementally at fold time (Bloom of a union = merge of Blooms —
  *    the base is never re-read), and is cached in the JVM keyed by
  *    mtime so steady-state batches pay zero bytes for it. At cluster
  *    scale the same layout shards by hash prefix; the read bound is
  *    unchanged.
  *
  * Correctness never depends on the Bloom: it only PRUNES
  * definitely-absent probes. A missing/torn/overflowed Bloom degrades
  * to reading the uncovered base chunks in full (recorded in
  * [[Metrics]]), never to a wrong answer; false positives are always
  * resolved by the exact check.
  */
object ClaimStore {

  /** Per-batch seen-side read accounting, for the trajectory bench:
    * `plannedSeenBytes` is the manifest size of every claim file
    * selected for reading this batch (the driver-side read plan — the
    * parquet reader may read less via row-group pruning, never more
    * except footers). Reset at batch start, read after.
    */
  object Metrics {
    val plannedSeenBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val bloomProbeBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val baseFilesSelected = new java.util.concurrent.atomic.AtomicLong(0)
    val baseFilesTotal = new java.util.concurrent.atomic.AtomicLong(0)
    val positives = new java.util.concurrent.atomic.AtomicLong(0)
    val fullFallbacks = new java.util.concurrent.atomic.AtomicLong(0)
    def reset(): Unit = Seq(plannedSeenBytes, bloomProbeBytes, baseFilesSelected,
      baseFilesTotal, positives, fullFallbacks).foreach(_.set(0))
  }

  /** Bloom sizing is FIXED per table at first fold (merge requires
    * identical bit width); a config change triggers a one-time rebuild
    * from the base. `bloomItems` should be sized for the expected
    * distinct-claim corpus — overflow only raises the false-positive
    * rate (more exact-check reads), never breaks correctness.
    */
  final case class Config(
      bloomItems: Long = 4L * 1000 * 1000,
      bloomFpp: Double = 0.01,
      positivesCap: Int = 100000,
      foldTargetBytes: Long = 8L * 1024 * 1024,
      expireKeep: Int = 64)

  private def batchOf(e: SnapTable.FileEntry): Option[Long] =
    e.tag.collect { case t if t.startsWith("b:") => t.stripPrefix("b:").toLong }
  private def isBase(e: SnapTable.FileEntry): Boolean = e.tag.contains("base")

  /** The last batch id whose claims are COMMITTED (folds preserve it). */
  def lastBatch(spark: SparkSession, root: String): Option[Long] =
    SnapTable.lastWatermark(spark, root).map(_.toLong)

  /** Commit this batch's new claims (single column `hCol`) atomically.
    * Idempotent under replay: if a previous attempt of `batchId` (or a
    * later batch — a rewound checkpoint, out of contract but harmless
    * here) already committed, the append is skipped; the claims are a
    * deterministic function of the batch and the earlier claim state,
    * so the committed set is exactly what this attempt would write.
    * An empty claim set commits as a pure watermark bump (no files).
    */
  def appendClaims(spark: SparkSession, root: String, claims: DataFrame,
                   hCol: String, batchId: Long): Unit = {
    if (lastBatch(spark, root).exists(_ >= batchId)) return
    // exactStats off: the claim read path never uses manifest row
    // counts, and skipping the read-back stats job halves the per-batch
    // write cost of each domain
    SnapTable.append(spark, root, claims.select(col(hCol)),
      watermark = Some(batchId.toString), tag = Some(s"b:$batchId"),
      exactStats = false)
    ()
  }

  /** The claims relevant to `batchId`, restricted to batches <
    * `batchId` (a replayed batch must not see its own earlier attempt's
    * claims). Returns a single-column (`hCol`) frame whose intersection
    * with `batchHashes` equals the true seen set — recent batch files
    * contribute fully (they are small), the folded base contributes
    * only Bloom-positive probes resolved by a manifest-pruned exact
    * check. `batchHashes` must be the batch's distinct claim hashes
    * (callers pin its lineage: it is collected through the Bloom here
    * and reused in their own joins). None = no earlier claims.
    */
  def seenFor(spark: SparkSession, root: String, batchHashes: DataFrame,
              hCol: String, batchId: Long,
              cfg: Config = Config()): Option[DataFrame] = {
    val snap = SnapTable.snapshot(spark, root).getOrElse(return None)
    val recent = snap.files.filter(e => batchOf(e).exists(_ < batchId))
    val base = snap.files.filter(isBase)
    Metrics.baseFilesTotal.addAndGet(base.size.toLong)
    val reads = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (recent.nonEmpty) {
      Metrics.plannedSeenBytes.addAndGet(recent.map(_.bytes).sum)
      reads += spark.read.parquet(recent.map(_.path): _*)
    }
    if (base.nonEmpty) {
      val bloom = loadBloom(spark, root)
      val (covered, uncovered) = bloom match {
        case Some(b) => base.partition(e => b.covered(new Path(e.path).getName))
        case None => (Vector.empty[SnapTable.FileEntry], base)
      }
      if (uncovered.nonEmpty) {
        // chunks the Bloom does not cover yet (crashed Bloom write, or
        // config-change rebuild pending): read in full — correctness
        // first, the next fold heals the coverage
        Metrics.fullFallbacks.incrementAndGet()
        Metrics.plannedSeenBytes.addAndGet(uncovered.map(_.bytes).sum)
        reads += spark.read.parquet(uncovered.map(_.path): _*)
      }
      if (covered.nonEmpty) {
        val pos = probePositives(spark, root, bloom.get, batchHashes, hCol,
          cfg.positivesCap)
        pos match {
          case None =>
            // over the cap: a pathologically duplicate-heavy batch —
            // read the covered base in full (correct, recorded)
            Metrics.fullFallbacks.incrementAndGet()
            Metrics.plannedSeenBytes.addAndGet(covered.map(_.bytes).sum)
            reads += spark.read.parquet(covered.map(_.path): _*)
          case Some(sorted) if sorted.nonEmpty =>
            Metrics.positives.addAndGet(sorted.length.toLong)
            val picked = covered.filter { e =>
              (e.lo, e.hi) match {
                case (Some(l), Some(h)) =>
                  val i = lowerBound(sorted, l)
                  i < sorted.length && sorted(i) <= h
                case _ => true // no bounds recorded: must read
              }
            }
            Metrics.baseFilesSelected.addAndGet(picked.size.toLong)
            if (picked.nonEmpty) {
              Metrics.plannedSeenBytes.addAndGet(picked.map(_.bytes).sum)
              reads += spark.read.parquet(picked.map(_.path): _*)
                .where(col(hCol).isInCollection(sorted))
            }
          case _ => // zero positives: the whole base costs zero bytes
        }
      }
    }
    if (reads.isEmpty) None
    else Some(reads.map(_.select(col(hCol))).reduce(_ union _))
  }

  /** Fold the claim files of batches <= `upToBatch` into range-clustered
    * sorted base chunks (ONE atomic rewrite — the base is never read or
    * rewritten, the LSM-append shape), extend the Bloom over the new
    * chunks (Bloom-of-union = merge, so this too never re-reads the
    * base), and expire old manifests. Callers pass only COMMITTED
    * batches (`currentBatchId - 1`), mirroring the engine's commit
    * order, so no folded batch can replay.
    */
  def fold(spark: SparkSession, root: String, hCol: String, upToBatch: Long,
           cfg: Config = Config()): Unit = {
    if (upToBatch < 0) return
    val snap = SnapTable.snapshot(spark, root).getOrElse(return)
    val victims = snap.files.filter(e => batchOf(e).exists(_ <= upToBatch))
    if (victims.nonEmpty) {
      val nOut = math.max(1L, victims.map(_.bytes).sum / cfg.foldTargetBytes).toInt
      SnapTable.rewrite(spark, root,
        pick = e => batchOf(e).exists(_ <= upToBatch),
        rewriteAs = identity, // claims are globally distinct by construction
        statsCol = Some(hCol), clusterFiles = nOut, tag = Some("base"))
    }
    refreshBloom(spark, root, hCol, cfg)
    SnapTable.expire(spark, root, keepLast = cfg.expireKeep)
  }

  // ---- Bloom sidecar ---------------------------------------------------
  //
  // Layout: `<root>/bloom.bin` = one JSON header line (covered base file
  // names, sizing params, payload CRC) + the spark-sketch BloomFilter
  // bytes. Written tmp+rename AFTER the fold commit; a crash in between
  // leaves a stale Bloom whose uncovered chunks are read in full until
  // the next fold heals them. Torn/corrupt content fails the CRC and is
  // treated as absent. Cached per JVM keyed by file mtime (it changes
  // only at folds), including the executor-side broadcast of its bytes.

  private final case class LoadedBloom(bytes: Array[Byte], covered: Set[String],
                                       items: Long, fppBits: Long,
                                       bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]])

  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[LoadedBloom])]()

  private def bloomPath(root: String) = new Path(root, "bloom.bin")

  private def loadBloom(spark: SparkSession, root: String): Option[LoadedBloom] = {
    val p = bloomPath(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = try { if (f.exists(p)) Some(f.getFileStatus(p)) else None }
    catch { case scala.util.control.NonFatal(_) => None }
    st match {
      case None => None
      case Some(s) =>
        val key = new Path(root).toString
        val cached = bloomCache.get(key)
        if (cached != null && cached._1 == s.getModificationTime) cached._2
        else {
          val loaded = readBloomFile(spark, f, p)
          val old = bloomCache.put(key, (s.getModificationTime, loaded))
          if (old != null) old._2.foreach(b => try b.bcast.destroy()
          catch { case scala.util.control.NonFatal(_) => })
          loaded
        }
    }
  }

  private def readBloomFile(spark: SparkSession, f: org.apache.hadoop.fs.FileSystem,
                            p: Path): Option[LoadedBloom] =
    try {
      val in = f.open(p)
      val all = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
      val nl = all.indexOf('\n'.toByte)
      if (nl < 0) return None
      val header = graft.json.Json.parse(new String(all, 0, nl, "UTF-8"))
        .asInstanceOf[graft.json.JObj]
      val payload = java.util.Arrays.copyOfRange(all, nl + 1, all.length)
      val crc = new java.util.zip.CRC32
      crc.update(payload)
      def num(k: String) = header(k).asInstanceOf[graft.json.JNum].literal.toLong
      if (crc.getValue != num("crc")) return None
      val covered = header("covered").asInstanceOf[graft.json.JArr].items
        .collect { case graft.json.JStr(s) => s }.toSet
      Some(LoadedBloom(payload, covered, num("items"), num("bits"),
        spark.sparkContext.broadcast(payload)))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def writeBloomFile(spark: SparkSession, root: String,
                             covered: Set[String], items: Long,
                             bf: BloomFilter): Unit = {
    val p = bloomPath(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val payload = {
      val buf = new java.io.ByteArrayOutputStream()
      bf.writeTo(buf)
      buf.toByteArray
    }
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    import graft.json._
    val header = JObj.of(
      "items" -> Json.num(items),
      "bits" -> Json.num(bf.bitSize()),
      "crc" -> Json.num(crc.getValue),
      "covered" -> JArr(covered.toVector.sorted.map(JStr(_): JValue))).render
    val tmp = new Path(root, s".bloom.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try { out.write(header.getBytes("UTF-8")); out.write('\n'); out.write(payload) }
    finally out.close()
    f.delete(p, false) // single streaming writer; a torn window reads as absent
    require(f.rename(tmp, p), s"bloom publish failed: $tmp -> $p")
  }

  /** Extend (or heal, or rebuild-on-resize) the Bloom so it covers every
    * current base chunk. Only the chunks the current Bloom does NOT
    * cover are read — in steady state exactly the chunks the fold just
    * wrote.
    */
  private def refreshBloom(spark: SparkSession, root: String, hCol: String,
                           cfg: Config): Unit = {
    val snap = SnapTable.snapshot(spark, root).getOrElse(return)
    val base = snap.files.filter(isBase)
    if (base.isEmpty) return
    val names = base.map(e => new Path(e.path).getName).toSet
    val wantBits = BloomFilter.create(cfg.bloomItems, cfg.bloomFpp).bitSize()
    // a sizing change orphans the old Bloom (bit widths must match to
    // merge): rebuild from scratch over the whole base, once
    val old = loadBloom(spark, root)
      .filter(b => b.items == cfg.bloomItems && b.fppBits == wantBits)
    val todo = base.filter(e => !old.exists(_.covered(new Path(e.path).getName)))
    if (todo.isEmpty && old.exists(_.covered == names)) return
    val bf =
      if (todo.isEmpty) BloomFilter.readFrom(old.get.bytes)
      else {
        val built = spark.read.parquet(todo.map(_.path): _*)
          .stat.bloomFilter(hCol, cfg.bloomItems, cfg.bloomFpp)
        old match {
          case Some(o) => built.mergeInPlace(BloomFilter.readFrom(o.bytes))
          case None => built
        }
      }
    writeBloomFile(spark, root, names, cfg.bloomItems, bf)
  }

  /** Probe the batch hashes through the Bloom; Some(sorted positives)
    * or None when they exceed `cap` (caller falls back to a full read).
    */
  private def probePositives(spark: SparkSession, root: String, b: LoadedBloom,
                             batchHashes: DataFrame, hCol: String,
                             cap: Int): Option[Array[String]] = {
    Metrics.bloomProbeBytes.addAndGet(b.bytes.length.toLong)
    val bc =
      try { b.bcast.value; b.bcast } // cached broadcast may outlive a stopped context
      catch { case scala.util.control.NonFatal(_) =>
        spark.sparkContext.broadcast(b.bytes)
      }
    val pos = batchHashes.select(col(hCol).cast("string"))
      .as[String](Encoders.STRING)
      .mapPartitions { it =>
        // callers skip a pre-distinct shuffle; dedupe per partition so a
        // hot hash (a line present in every doc) cannot flood the cap —
        // the set is bounded by the partition's distinct batch hashes
        val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bc.value))
        val seen = new java.util.HashSet[String]()
        it.filter(h => h != null && seen.add(h) && bf.mightContainString(h))
      }(Encoders.STRING)
      .limit(cap + 1).collect()
    // residual cross-partition duplicates are dropped driver-side free
    if (pos.length > cap) None else Some(pos.distinct.sorted)
  }

  /** First index i with xs(i) >= key (xs sorted ascending). */
  private def lowerBound(xs: Array[String], key: String): Int = {
    var lo = 0; var hi = xs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }
}
