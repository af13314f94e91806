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
    * `chunkFpp` sizes the PER-CHUNK filters (each to its own chunk's
    * row count): these drive chunk SELECTION, so their fpp bounds the
    * expected spurious chunk reads per batch (positives x chunks x
    * chunkFpp), not just spurious probe rows. Chunk filters are
    * WRITE-ONCE per chunk — a `chunkFpp` change applies only to chunks
    * created after it (existing filters keep their sizing until their
    * chunk is merged away); it never needs a rebuild because any fpp
    * only trades read amplification, never correctness.
    *
    * `maxRuns` caps the number of sorted base RUNS (each fold appends
    * one): when exceeded, [[fold]] merges the smallest runs back to the
    * cap — size-tiered LSM compaction. Per-chunk Blooms already keep
    * READS independent of run count; the cap bounds the filter-blob
    * count and fold bookkeeping on an unbounded stream. Merging
    * smallest-first makes run sizes geometric, so a claim is rewritten
    * O(log batches) times over the stream's life — never the
    * linear-in-history write amplification of a fixed-period major
    * compaction.
    */
  final case class Config(
      bloomItems: Long = 4L * 1000 * 1000,
      bloomFpp: Double = 0.01,
      chunkFpp: Double = 1e-4,
      positivesCap: Int = 100000,
      foldTargetBytes: Long = 8L * 1024 * 1024,
      expireKeep: Int = 64,
      maxRuns: Int = 8)

  private def batchOf(e: SnapTable.FileEntry): Option[Long] =
    e.tag.collect { case t if t.startsWith("b:") => t.stripPrefix("b:").toLong }
  private def isBase(e: SnapTable.FileEntry): Boolean = e.tag.contains("base")

  /** The last batch id whose claims are COMMITTED (folds preserve it). */
  def lastBatch(spark: SparkSession, root: String): Option[Long] = {
    ensureMigrated(spark, root)
    SnapTable.lastWatermark(spark, root).map(_.toLong)
  }

  // ---- legacy layout migration -----------------------------------------
  //
  // Before the SnapTable move the claim domains were plain
  // batch-partitioned parquet (`<root>/batch=N/...`, folded base at
  // `batch=-1`). A checkpointed stream resumed across the upgrade must
  // keep honoring those claims — silently ignoring them would re-admit
  // every previously-claimed duplicate and break batch parity. On first
  // touch of a root that still has legacy batch dirs, each legacy batch
  // whose id is above the table watermark imports as a tagged append in
  // batch order (the per-batch tags preserve the replay-exclusion rule;
  // `batch=-1` sorts below every real batch, exactly its old contract),
  // ending at the legacy watermark. The gate is the WATERMARK, never
  // mere meta/ existence: a crash after the first imported batch leaves
  // meta/ present with the import half done, and a restart must resume
  // the remaining batches, not skip them. Claims are distinct'd and
  // anti-joined against the already-imported table on the way in (the
  // legacy layout's own crash caveats could leave a hash in two dirs;
  // the table's claims-globally-distinct invariant must hold). Legacy
  // dirs are left in place — the import is watermark-idempotent, and
  // deleting user data on upgrade is not this layer's call.
  // Single-streaming-writer contract as for the Bloom.

  private val migratedRoots =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def ensureMigrated(spark: SparkSession, root: String): Unit = {
    if (migratedRoots.putIfAbsent(root, java.lang.Boolean.TRUE) != null) return
    try {
      val rp = new Path(root)
      val f = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!f.exists(rp)) return
      val legacy = f.listStatus(rp)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .map(s => (s.getPath.getName.stripPrefix("batch=").toLong, s.getPath))
        .sortBy(_._1)
      if (legacy.isEmpty) return
      // the hash column is whatever single column the legacy files hold
      for ((b, dir) <- legacy) {
        val hasData = f.listStatus(dir).exists(s => s.isFile &&
          s.getPath.getName.endsWith(".parquet") &&
          !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
        if (hasData && !SnapTable.lastWatermark(spark, root).map(_.toLong).exists(_ >= b)) {
          val df = spark.read.parquet(dir.toString)
          val hc = df.columns.head
          val cur = df.select(col(hc)).distinct()
          val imported = SnapTable.snapshot(spark, root) match {
            case Some(s) if s.files.nonEmpty =>
              cur.join(SnapTable.read(spark, root).select(col(hc)),
                Seq(hc), "left_anti")
            case _ => cur
          }
          SnapTable.append(spark, root, imported,
            watermark = Some(b.toString), tag = Some(s"b:$b"),
            exactStats = false)
        }
      }
      // trailing empty batches carry no claims but DO advance the
      // watermark (appendClaims replay-skips on it)
      val maxB = legacy.map(_._1).max
      if (!SnapTable.lastWatermark(spark, root).map(_.toLong).exists(_ >= maxB)) {
        val hc = SnapTable.snapshot(spark, root)
          .flatMap(_.files.headOption).map(e =>
            spark.read.parquet(e.path).columns.head).getOrElse("h")
        SnapTable.append(spark, root,
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(hc,
                org.apache.spark.sql.types.StringType)))),
          watermark = Some(maxB.toString), exactStats = false)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        migratedRoots.remove(root)
        throw new IllegalStateException(
          s"legacy claim-sidecar migration failed for $root — claims from " +
            "the old batch-partitioned layout could not be imported; refusing " +
            "to continue without them (duplicates would be re-admitted)", e)
    }
  }

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
    ensureMigrated(spark, root)
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
            // Chunk selection: every LSM fold writes a sorted run
            // spanning the FULL hash range, so [lo,hi] bounds alone
            // would select one chunk from EVERY run for any recurring
            // positive — O(runs) reads per batch, growing with fold
            // count (measured 21x seen-bytes growth over 200 batches).
            // The per-chunk Bloom (an SSTable filter block) selects
            // only chunks that actually CONTAIN a positive: reads are
            // bounded by the batch's true duplicate spread plus
            // positives x chunks x chunkFpp, independent of run count.
            // Bounds first, then the chunk filter: within one run the
            // chunks are range-partitioned (disjoint bounds), so a
            // positive is bounds-candidate in <= 1 chunk per run —
            // <= maxRuns candidates per positive. Only candidates have
            // their filter consulted (lazy-loaded, LRU-cached), so the
            // filters resident per batch are O(positives x maxRuns),
            // never O(chunks in the base).
            val picked = covered.filter { e =>
              val name = new Path(e.path).getName
              (e.lo, e.hi) match {
                case (Some(l), Some(h)) =>
                  val i = lowerBound(sorted, l)
                  i < sorted.length && sorted(i) <= h && {
                    chunkBloomFor(spark, root, bloom.get, name) match {
                      case Some(cb) =>
                        var sel = false; var k = i
                        while (!sel && k < sorted.length && sorted(k) <= h) {
                          sel = cb.mightContainString(sorted(k)); k += 1
                        }
                        sel
                      case None => true // no/torn filter: bounds decide
                    }
                  }
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
    ensureMigrated(spark, root)
    val snap = SnapTable.snapshot(spark, root).getOrElse(return)
    val victims = snap.files.filter(e => batchOf(e).exists(_ <= upToBatch))
    if (victims.nonEmpty) {
      val nOut = math.max(1L, victims.map(_.bytes).sum / cfg.foldTargetBytes).toInt
      SnapTable.rewrite(spark, root,
        pick = e => batchOf(e).exists(_ <= upToBatch),
        rewriteAs = identity, // claims are globally distinct by construction
        statsCol = Some(hCol), clusterFiles = nOut, tag = Some("base"))
    }
    mergeRunsOverCap(spark, root, hCol, cfg)
    refreshBloom(spark, root, hCol, cfg)
    SnapTable.expire(spark, root, keepLast = cfg.expireKeep)
  }

  /** The staging stamp shared by the chunks of one sorted run
    * (`<stamp>-<i>.parquet`, see `SnapTable.stageFiles`).
    */
  private def runOf(e: SnapTable.FileEntry): String =
    new Path(e.path).getName.takeWhile(_ != '-')

  /** Size-tiered run-count cap: each fold appends one sorted run, so a
    * long-lived stream accumulates runs without bound — reads stay flat
    * (the per-chunk Blooms select by content) but the filter sidecar
    * carries one blob per chunk and the fold bookkeeping one entry per
    * file. When the base exceeds `maxRuns` runs, merge the SMALLEST
    * runs (by bytes) back down to the cap in one snapshot-isolated
    * rewrite. Smallest-first keeps run sizes geometric — each claim is
    * rewritten O(log batches) times total, the classic size-tiered LSM
    * bound — and the merged run's chunk filters are rebuilt by the same
    * [[refreshBloom]] incremental path (only the NEW chunks are read;
    * re-merging their claims into the global filter is a no-op by
    * Bloom-union idempotence).
    */
  private def mergeRunsOverCap(spark: SparkSession, root: String, hCol: String,
                               cfg: Config): Unit = {
    if (cfg.maxRuns <= 0) return
    val snap = SnapTable.snapshot(spark, root).getOrElse(return)
    val runs = snap.files.filter(isBase).groupBy(runOf)
      .map { case (r, fs) => (r, fs.map(_.bytes).sum) }.toVector
    if (runs.size <= cfg.maxRuns) return
    val victims = runs.sortBy(_._2).take(runs.size - cfg.maxRuns + 1)
      .map(_._1).toSet
    val bytes = runs.filter(r => victims(r._1)).map(_._2).sum
    val nOut = math.max(1L, bytes / cfg.foldTargetBytes).toInt
    SnapTable.rewrite(spark, root,
      pick = e => isBase(e) && victims(runOf(e)),
      rewriteAs = identity,
      statsCol = Some(hCol), clusterFiles = nOut, tag = Some("base"))
    ()
  }

  // ---- Bloom sidecar ---------------------------------------------------
  //
  // Layout: `<root>/bloom.bin` = one JSON header line (covered base file
  // names, sizing params, CRC of the payload) + the GLOBAL spark-sketch
  // BloomFilter bytes (prunes PROBES); plus `<root>/bloomchunks/
  // <chunkFileName>.bf` = one small CRC-trailed PER-CHUNK BloomFilter
  // file per base chunk (prunes chunk SELECTION — the SSTable
  // filter-block layout, one file per block). Chunk filter files are
  // IMMUTABLE like the chunks they describe: written once by the fold
  // that created the chunk, deleted when the chunk leaves the base —
  // never rewritten, never carried through the bloom.bin rewrite. That
  // keeps BOTH scale terms bounded: the per-fold sidecar write is
  // O(global filter + new chunks), not O(all chunk filters); and the
  // driver holds only the chunk filters a batch actually consults
  // (bounds-candidates: <= maxRuns per positive), LRU-cached, never the
  // whole O(corpus) filter set. bloom.bin is written tmp+rename AFTER
  // the fold commit; a crash in between leaves a stale file whose
  // uncovered chunks are read in full until the next fold heals them.
  // Torn/corrupt content (either file kind) fails its CRC and is
  // treated as absent — degrading selection to [lo,hi] bounds or reads
  // to full chunks, never to a wrong answer. The remaining O(corpus)
  // term is the global filter itself (~1.2 bytes/claim at fpp 0.01),
  // rewritten per fold and broadcast once per generation; past ~10^9
  // claims shard it (and the table) by hash prefix — the read bound
  // per batch is unchanged, each shard serves its prefix.
  //
  // Legacy (first r7 layout): chunk blobs embedded in bloom.bin after
  // the global filter, indexed by header offsets. Still readable (the
  // embedded blobs are served from the validated in-memory payload);
  // the next fold migrates them to the one-file-per-chunk layout.

  private final case class LoadedBloom(bytes: Array[Byte], covered: Set[String],
                                       items: Long, fpp: Double,
                                       legacyChunks: Map[String, Array[Byte]],
                                       bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]])

  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((Long, Long), Option[LoadedBloom])]()

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
        // cache identity is (mtime, length) — mtime alone misses two
        // folds inside one coarse mtime unit (1 s on several local/NFS
        // mounts), leaving readers on a filter whose covered set lacks
        // the new chunks (correct, but full-read fallbacks until a
        // later fold); the header's covered-names list makes the length
        // move with every refresh
        val stamp = (s.getModificationTime, s.getLen)
        val cached = bloomCache.get(key)
        val cachedValid = cached != null && cached._1 == stamp &&
          // a SparkContext restart kills the broadcast under a cached
          // entry; serving it would force a fresh (leaked) broadcast on
          // every probe — evict and reload instead
          cached._2.forall(b => try { b.bcast.value; true }
          catch { case scala.util.control.NonFatal(_) => false })
        if (cachedValid) cached._2
        else {
          val loaded = readBloomFile(spark, f, p)
          val old = bloomCache.put(key, (stamp, loaded))
          if (old != null) old._2.foreach(b => try b.bcast.destroy()
          catch { case scala.util.control.NonFatal(_) => })
          loaded
        }
    }
  }

  private def readFully(f: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val in = f.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  private def readBloomFile(spark: SparkSession, f: org.apache.hadoop.fs.FileSystem,
                            p: Path): Option[LoadedBloom] =
    try {
      val all = readFully(f, p)
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
      // pre-chunk-filter files have no glen: the whole payload is the
      // global filter and chunk selection falls back to [lo,hi] bounds
      // until the next refresh heals the chunk blobs
      val glen = header("glen") match {
        case graft.json.JNum(l) => l.toLong.toInt
        case _ => payload.length
      }
      val fpp = header("fpp") match {
        case graft.json.JNum(l) => l.toDouble
        case _ => -1.0 // legacy: unknown sizing -> treated as mismatch
      }
      val global = java.util.Arrays.copyOfRange(payload, 0, glen)
      // legacy embedded chunk blobs (first r7 layout); the current
      // layout stores chunk filters as their own files and has no
      // "chunks" key
      val legacyChunks: Map[String, Array[Byte]] = header.get("chunks") match {
        case Some(graft.json.JArr(items)) => items.collect {
          case o: graft.json.JObj =>
            val n = o("n").asInstanceOf[graft.json.JStr].s
            val off = o("off").asInstanceOf[graft.json.JNum].literal.toLong.toInt
            val len = o("len").asInstanceOf[graft.json.JNum].literal.toLong.toInt
            n -> java.util.Arrays.copyOfRange(payload, off, off + len)
        }.toMap
        case _ => Map.empty
      }
      Some(LoadedBloom(global, covered, num("items"), fpp,
        legacyChunks, spark.sparkContext.broadcast(global)))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def serializeBloom(bf: BloomFilter): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    bf.writeTo(buf)
    buf.toByteArray
  }

  private def writeBloomFile(spark: SparkSession, root: String,
                             covered: Set[String], items: Long, fpp: Double,
                             global: Array[Byte]): Unit = {
    val p = bloomPath(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val crc = new java.util.zip.CRC32
    crc.update(global)
    import graft.json._
    val header = JObj.of(
      "items" -> Json.num(items),
      "fpp" -> JNum(fpp.toString),
      "glen" -> Json.num(global.length.toLong),
      "crc" -> Json.num(crc.getValue),
      "covered" -> JArr(covered.toVector.sorted.map(JStr(_): JValue))).render
    val tmp = new Path(root, s".bloom.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try { out.write(header.getBytes("UTF-8")); out.write('\n'); out.write(global) }
    finally out.close()
    f.delete(p, false) // single streaming writer; a torn window reads as absent
    require(f.rename(tmp, p), s"bloom publish failed: $tmp -> $p")
  }

  // ---- per-chunk filter files ------------------------------------------

  private def chunkDir(root: String) = new Path(root, "bloomchunks")
  private def chunkFilePath(root: String, chunkName: String) =
    new Path(chunkDir(root), s"$chunkName.bf")

  /** Blob + 8-byte big-endian CRC32 trailer, tmp+rename. Content is a
    * deterministic function of the (immutable) chunk and `chunkFpp`, so
    * overwriting a stray existing file is harmless.
    */
  private def writeChunkFile(f: org.apache.hadoop.fs.FileSystem, root: String,
                             chunkName: String, blob: Array[Byte]): Unit = {
    f.mkdirs(chunkDir(root))
    val crc = new java.util.zip.CRC32
    crc.update(blob)
    val trailer = java.nio.ByteBuffer.allocate(8).putLong(crc.getValue).array()
    val tmp = new Path(chunkDir(root),
      s".$chunkName.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try { out.write(blob); out.write(trailer) } finally out.close()
    val dst = chunkFilePath(root, chunkName)
    f.delete(dst, false)
    require(f.rename(tmp, dst), s"chunk filter publish failed: $tmp -> $dst")
  }

  private def readChunkFile(f: org.apache.hadoop.fs.FileSystem, root: String,
                            chunkName: String): Option[Array[Byte]] =
    try {
      val p = chunkFilePath(root, chunkName)
      if (!f.exists(p)) return None
      val all = readFully(f, p)
      if (all.length < 9) { f.delete(p, false); return None } // definitively torn
      val blob = java.util.Arrays.copyOfRange(all, 0, all.length - 8)
      val stored = java.nio.ByteBuffer.wrap(all, all.length - 8, 8).getLong
      val crc = new java.util.zip.CRC32
      crc.update(blob)
      if (crc.getValue == stored) Some(blob)
      else {
        // fully read but invalid (torn write): delete so the NEXT fold's
        // existence check recreates it — selection meanwhile degrades to
        // bounds for this chunk, never to a wrong answer. Transient IO
        // errors take the catch below and delete nothing.
        f.delete(p, false)
        None
      }
    } catch {
      // the filesystem's own checksum verification is as definitive as
      // the trailer CRC: delete so the next fold recreates the filter
      case _: org.apache.hadoop.fs.ChecksumException =>
        try f.delete(chunkFilePath(root, chunkName), false)
        catch { case scala.util.control.NonFatal(_) => }
        None
      case scala.util.control.NonFatal(_) => None
    }

  /** Chunk filters touched by recent batches, LRU-evicted on a BYTE
    * budget (an entry-count cap would let driver residency scale with
    * chunk size — 512 filters of 256 MB chunks at fpp 1e-4 is ~10 GB):
    * chunk filter files are immutable AND uniquely named (the 128-bit
    * staging stamp), so a cached parse is never stale — but an ABSENT
    * file is never cached (it may be healed by the next fold). Legacy
    * sidecars serve their embedded blobs through the same cache key
    * space.
    */
  private object chunkFilterCache {
    private val maxBytes = 64L * 1024 * 1024
    private val map =
      new java.util.LinkedHashMap[String, (BloomFilter, Long)](64, 0.75f, true)
    private var bytes = 0L
    def get(key: String): Option[BloomFilter] =
      synchronized(Option(map.get(key)).map(_._1))
    def put(key: String, bf: BloomFilter, sz: Long): Unit = synchronized {
      val old = map.put(key, (bf, sz))
      bytes += sz - (if (old != null) old._2 else 0L)
      val it = map.entrySet().iterator()
      // eldest-first; never evict the entry just inserted (an oversized
      // single filter stays resident alone rather than thrashing)
      while (bytes > maxBytes && it.hasNext) {
        val e = it.next()
        if (e.getKey != key) { bytes -= e.getValue._2; it.remove() }
      }
    }
  }

  private def chunkBloomFor(spark: SparkSession, root: String, b: LoadedBloom,
                            chunkName: String): Option[BloomFilter] = {
    val key = s"${new Path(root).toString}#$chunkName"
    val cached = chunkFilterCache.get(key)
    if (cached.isDefined) return cached
    val f = bloomPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fromFile = b.legacyChunks.get(chunkName).isEmpty
    val bytes = b.legacyChunks.get(chunkName).orElse(readChunkFile(f, root, chunkName))
    bytes.flatMap { arr =>
      // a CRC-valid but unparseable blob (corrupt legacy header offsets,
      // a sketch-format change) must DEGRADE to bounds, not wedge the
      // stream: the parse failure is as definitive as a CRC mismatch,
      // so delete a file-backed filter for the next fold to rebuild
      try {
        val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(arr))
        chunkFilterCache.put(key, bf, arr.length.toLong)
        Some(bf)
      } catch {
        case scala.util.control.NonFatal(_) =>
          if (fromFile)
            try f.delete(chunkFilePath(root, chunkName), false)
            catch { case scala.util.control.NonFatal(_) => }
          None
      }
    }
  }

  /** Extend (or heal, or rebuild-on-resize) the Bloom sidecar so the
    * global filter covers every current base chunk and every chunk has
    * its own filter FILE. Only chunks without a filter yet are read —
    * in steady state exactly the chunks the fold just wrote (legacy
    * embedded blobs are migrated by copy, not re-read); filter files of
    * chunks that left the base (merge victims) are deleted. Config
    * identity is (items, fpp) recorded in the header — NOT a probe
    * BloomFilter.create, whose corpus-sized allocation per fold just to
    * learn the bit width would spike the driver heap.
    */
  private def refreshBloom(spark: SparkSession, root: String, hCol: String,
                           cfg: Config): Unit = {
    val snap = SnapTable.snapshot(spark, root).getOrElse(return)
    val base = snap.files.filter(isBase)
    if (base.isEmpty) return
    def name(e: SnapTable.FileEntry): String = new Path(e.path).getName
    val names = base.map(name).toSet
    val rawOld = loadBloom(spark, root)
    // a sizing change orphans the old GLOBAL filter (bit widths must
    // match to merge): rebuild it from the whole base, once. Chunk
    // filters are sized per chunk by chunkFpp and are unaffected.
    val old = rawOld.filter(b => b.items == cfg.bloomItems && b.fpp == cfg.bloomFpp)
    val f = bloomPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // sweep bloom.bin tmps orphaned by a crash between create and rename
    // (same age gate + single-writer argument as the chunk-filter tmps)
    try {
      val now = System.currentTimeMillis()
      f.listStatus(new Path(root)).filter(s => s.isFile &&
          s.getPath.getName.startsWith(".bloom.tmp-") &&
          now - s.getModificationTime > 15 * 60 * 1000L)
        .foreach(s => try f.delete(s.getPath, false)
        catch { case scala.util.control.NonFatal(_) => })
    } catch { case scala.util.control.NonFatal(_) => }
    // ---- chunk filter files: create missing, sweep departed
    val haveChunk: Set[String] = {
      val cd = chunkDir(root)
      if (!f.exists(cd)) Set.empty
      else {
        val all = f.listStatus(cd).filter(_.isFile)
        // sweep tmp files orphaned by a crash between create and rename
        // (age-gated: this fold's own writes are seconds old at most,
        // and the single-streaming-writer contract means no OTHER
        // writer's in-flight tmp can be live here)
        val now = System.currentTimeMillis()
        all.filter(s => s.getPath.getName.startsWith(".") &&
            s.getPath.getName.contains(".tmp-") &&
            now - s.getModificationTime > 15 * 60 * 1000L)
          .foreach(s => try f.delete(s.getPath, false)
          catch { case scala.util.control.NonFatal(_) => })
        all.map(_.getPath.getName)
          .filter(n => n.endsWith(".bf") && !n.startsWith("."))
          .map(_.stripSuffix(".bf")).toSet
      }
    }
    val missing = base.filter(e => !haveChunk(name(e)))
    val (fromLegacy, toBuild) = missing.partition(e =>
      rawOld.exists(_.legacyChunks.contains(name(e))))
    for (e <- fromLegacy)
      writeChunkFile(f, root, name(e), rawOld.get.legacyChunks(name(e)))
    val (statful, statless) = toBuild.partition(_.rows >= 0)
    // unknown-stats files (defensive path): observe all their row
    // counts in ONE job, then build through the same single-job path
    // as the stat-bearing chunks — never two sequential jobs per file
    val counted =
      if (statless.isEmpty) Vector.empty[SnapTable.FileEntry]
      else {
        val counts = spark.read.parquet(statless.map(_.path): _*)
          .groupBy(input_file_name().as("fn")).count().collect()
          .map(r => { val fn = r.getString(0)
            fn.substring(fn.lastIndexOf('/') + 1) -> r.getLong(1) }).toMap
        statless.map(e => e.copy(rows = counts.getOrElse(name(e), 16L)))
      }
    val built = buildChunkFilters(spark, statful ++ counted, hCol, cfg.chunkFpp)
    for (e <- toBuild)
      writeChunkFile(f, root, name(e), built.getOrElse(name(e),
        // a chunk whose read yielded no rows: an empty (all-negative)
        // filter is exactly right
        serializeBloom(BloomFilter.create(16, cfg.chunkFpp))))
    haveChunk.diff(names).foreach(n => f.delete(chunkFilePath(root, n), false))
    // ---- global filter
    val globalTodo = base.filter(e => !old.exists(_.covered(name(e))))
    if (globalTodo.isEmpty && old.exists(o => o.covered == names && o.legacyChunks.isEmpty))
      return
    val global =
      if (globalTodo.isEmpty) old.get.bytes
      else serializeBloom {
        val built = spark.read.parquet(globalTodo.map(_.path): _*)
          .stat.bloomFilter(hCol, cfg.bloomItems, cfg.bloomFpp)
        old match {
          case Some(o) => built.mergeInPlace(
            BloomFilter.readFrom(new java.io.ByteArrayInputStream(o.bytes)))
          case None => built
        }
      }
    writeBloomFile(spark, root, names, cfg.bloomItems, cfg.bloomFpp, global)
  }

  /** Build the missing chunks' filters in ONE Spark job: all files are
    * read together, each task accumulates PER-FILE partial filters
    * (keyed by `input_file_name`, each sized from the file's manifest
    * row count so every partial of one file shares a bit width and
    * merges by OR), and the driver folds the partials. A merge fold
    * that produces K chunks costs one job over their bytes instead of
    * K sequential driver-scheduled jobs — the difference between
    * seconds and minutes when a size-tiered merge rewrites many chunks
    * at once. Build and probe use the same sketch primitives
    * (`putString`/`mightContainString`), so no false negative is
    * possible by construction; the exact-check still resolves false
    * positives.
    */
  private def buildChunkFilters(spark: SparkSession,
                                files: Seq[SnapTable.FileEntry], hCol: String,
                                fpp: Double): Map[String, Array[Byte]] = {
    if (files.isEmpty) return Map.empty
    val rowsByName: Map[String, Long] =
      files.map(e => new Path(e.path).getName -> math.max(e.rows, 16L)).toMap
    val bc = spark.sparkContext.broadcast(rowsByName)
    val partials = spark.read.parquet(files.map(_.path): _*)
      .select(col(hCol).cast("string"), input_file_name())
      .rdd.mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[String, BloomFilter]
        it.foreach { r =>
          val f = r.getString(1)
          val nm = f.substring(f.lastIndexOf('/') + 1)
          val bf = acc.getOrElseUpdate(nm, BloomFilter.create(bc.value(nm), fpp))
          val h = r.getString(0)
          if (h != null) bf.putString(h)
        }
        acc.iterator.map { case (nm, bf) => (nm, serializeBloom(bf)) }
      }.collect()
    bc.destroy() // one broadcast per fold otherwise outlives the stream
    partials.groupBy(_._1).map { case (nm, parts) =>
      val merged = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(parts.head._2))
      parts.iterator.drop(1).foreach(p => merged.mergeInPlace(
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(p._2))))
      nm -> serializeBloom(merged)
    }
  }

  /** Probe the batch hashes through the Bloom; Some(sorted positives)
    * or None when they exceed `cap` (caller falls back to a full read).
    */
  private def probePositives(spark: SparkSession, root: String, b: LoadedBloom,
                             batchHashes: DataFrame, hCol: String,
                             cap: Int): Option[Array[String]] = {
    Metrics.bloomProbeBytes.addAndGet(b.bytes.length.toLong)
    // loadBloom evicts entries whose broadcast died with its context,
    // so this fallback is belt-and-braces; a fresh broadcast made here
    // is destroyed after the probe rather than leaked per batch
    val (bc, fresh) =
      try { b.bcast.value; (b.bcast, false) }
      catch { case scala.util.control.NonFatal(_) =>
        (spark.sparkContext.broadcast(b.bytes), true)
      }
    try {
      val pos = batchHashes.select(col(hCol).cast("string"))
        .as[String](Encoders.STRING)
        .mapPartitions { it =>
          // callers skip a pre-distinct shuffle over the WHOLE batch;
          // dedupe per partition so a hot hash (a line present in every
          // doc) cannot flood downstream — the emitted set is bounded
          // by the partition's distinct Bloom-positive hashes
          val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bc.value))
          val seen = new java.util.HashSet[String]()
          it.filter(h => h != null && seen.add(h) && bf.mightContainString(h))
        }(Encoders.STRING)
        // distinct BEFORE the cap decision: the cap must measure
        // DISTINCT positives, or a previously-claimed hash appearing in
        // every partition (boilerplate) counts once per partition and
        // trips a spurious full-base fallback. This shuffles only the
        // positives (true duplicates + fpp), never the batch.
        .distinct()
        .limit(cap + 1).collect()
      if (pos.length > cap) None else Some(pos.sorted)
    } finally {
      if (fresh) try bc.destroy() catch { case scala.util.control.NonFatal(_) => }
    }
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
