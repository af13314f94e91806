package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.SnapTable

/** Pins for the SnapTable-backed claim store: exact seen-sets, replay
  * idempotence, Bloom no-false-negatives (build/probe consistency),
  * batch-bounded base reads, pruning, cap fallback, and Bloom healing.
  */
class ClaimStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/claims"

  private def hashes(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map(i => StreamingUtil.md5hex(s"claim-$i")).toDF("h")
  }
  private def hashSet(ids: Seq[Int]): Set[String] =
    ids.map(i => StreamingUtil.md5hex(s"claim-$i")).toSet

  private def seenSet(root: String, probe: Seq[Int], batchId: Long,
                      cfg: ClaimStore.Config = ClaimStore.Config()): Set[String] = {
    import spark.implicits._
    ClaimStore.seenFor(spark, root, hashes(probe), "h", batchId, cfg)
      .map(_.as[String].collect().toSet.intersect(hashSet(probe)))
      .getOrElse(Set.empty)
  }

  test("seen-sets are exact across appends, folds, and replay exclusion") {
    val root = tmp("cs1")
    // batches 0..2 claim disjoint ranges
    ClaimStore.appendClaims(spark, root, hashes(0 until 10), "h", 0L)
    ClaimStore.appendClaims(spark, root, hashes(10 until 20), "h", 1L)
    ClaimStore.appendClaims(spark, root, hashes(20 until 30), "h", 2L)
    assert(ClaimStore.lastBatch(spark, root).contains(2L))
    // batch 3 sees all earlier claims, exactly
    assert(seenSet(root, 0 until 40, 3L) == hashSet(0 until 30))
    // a REPLAY of batch 2 must not see its own earlier attempt's claims
    assert(seenSet(root, 0 until 40, 2L) == hashSet(0 until 20))
    // and must not commit a new snapshot
    val head = SnapTable.snapshot(spark, root).get.id
    ClaimStore.appendClaims(spark, root, hashes(20 until 30), "h", 2L)
    assert(SnapTable.snapshot(spark, root).get.id == head)
    // fold batches <= 2 into the base: same answers, through the Bloom
    ClaimStore.fold(spark, root, "h", 2L)
    val tags = SnapTable.snapshot(spark, root).get.files.flatMap(_.tag).toSet
    assert(tags == Set("base"), tags.toString)
    assert(seenSet(root, 0 until 40, 3L) == hashSet(0 until 30))
    assert(seenSet(root, 5 until 8, 3L) == hashSet(5 until 8))
    // claims stay globally distinct through the fold
    val all = SnapTable.read(spark, root).select("h")
    assert(all.count() == 30 && all.distinct().count() == 30)
  }

  test("bloom has no false negatives and an all-fresh batch reads zero base bytes") {
    val root = tmp("cs2")
    ClaimStore.appendClaims(spark, root, hashes(0 until 500), "h", 0L)
    ClaimStore.fold(spark, root, "h", 0L)
    // every claimed hash must be Bloom-positive (build/probe use the
    // same UTF-8 string hashing) — a false negative would silently
    // re-admit a duplicate
    assert(seenSet(root, 0 until 500, 1L) == hashSet(0 until 500))
    // the batch-bounded property: a batch with NO previously-claimed
    // hashes plans zero seen-side bytes (Bloom rejects everything;
    // fpp can theoretically cost a pruned chunk — sized far below any
    // plausible collision here)
    ClaimStore.Metrics.reset()
    assert(seenSet(root, 1000 until 1100, 1L).isEmpty)
    assert(ClaimStore.Metrics.plannedSeenBytes.get == 0L,
      s"fresh batch read ${ClaimStore.Metrics.plannedSeenBytes.get} base bytes")
    assert(ClaimStore.Metrics.baseFilesTotal.get > 0)
  }

  test("manifest pruning reads only the chunks containing positives") {
    val root = tmp("cs3")
    ClaimStore.appendClaims(spark, root, hashes(0 until 2000), "h", 0L)
    // tiny fold target -> many range-clustered base chunks
    val cfg = ClaimStore.Config(foldTargetBytes = 4096)
    ClaimStore.fold(spark, root, "h", 0L, cfg)
    val base = SnapTable.snapshot(spark, root).get.files
    assert(base.size > 3, s"need several chunks, got ${base.size}")
    assert(base.forall(e => e.lo.isDefined && e.hi.isDefined))
    // one duplicate probe -> exactly one chunk selected
    ClaimStore.Metrics.reset()
    assert(seenSet(root, Seq(42), 1L, cfg) == hashSet(Seq(42)))
    assert(ClaimStore.Metrics.positives.get == 1L)
    assert(ClaimStore.Metrics.baseFilesSelected.get == 1L,
      s"selected ${ClaimStore.Metrics.baseFilesSelected.get} of ${base.size}")
    assert(ClaimStore.Metrics.plannedSeenBytes.get < base.map(_.bytes).sum,
      "pruned read must be smaller than the full base")
  }

  test("positives over the cap fall back to a full covered read, still exact") {
    val root = tmp("cs4")
    ClaimStore.appendClaims(spark, root, hashes(0 until 100), "h", 0L)
    val cfg = ClaimStore.Config(positivesCap = 5)
    ClaimStore.fold(spark, root, "h", 0L, cfg)
    ClaimStore.Metrics.reset()
    assert(seenSet(root, 0 until 50, 1L, cfg) == hashSet(0 until 50))
    assert(ClaimStore.Metrics.fullFallbacks.get >= 1L)
  }

  test("a missing/torn bloom degrades to full reads and the next fold heals it") {
    val root = tmp("cs5")
    ClaimStore.appendClaims(spark, root, hashes(0 until 200), "h", 0L)
    ClaimStore.fold(spark, root, "h", 0L)
    // simulate a crash between the fold commit and the Bloom write
    val bloom = new java.io.File(s"$root/bloom.bin")
    assert(bloom.exists())
    java.nio.file.Files.writeString(bloom.toPath, "torn-garbage")
    ClaimStore.Metrics.reset()
    assert(seenSet(root, 0 until 300, 1L) == hashSet(0 until 200))
    assert(ClaimStore.Metrics.fullFallbacks.get >= 1L, "torn bloom must fall back")
    // more claims + a fold heal the coverage (fold reads only the
    // uncovered chunks, here all of them)
    ClaimStore.appendClaims(spark, root, hashes(200 until 250), "h", 1L)
    ClaimStore.fold(spark, root, "h", 1L)
    ClaimStore.Metrics.reset()
    assert(seenSet(root, 0 until 300, 2L) == hashSet(0 until 250))
    assert(ClaimStore.Metrics.fullFallbacks.get == 0L, "healed bloom must cover the base")
    // and a fresh batch is back to zero base bytes
    ClaimStore.Metrics.reset()
    assert(seenSet(root, 1000 until 1050, 2L).isEmpty)
    assert(ClaimStore.Metrics.plannedSeenBytes.get == 0L)
  }

  test("bloom resize triggers a one-time rebuild; answers unchanged") {
    val root = tmp("cs6")
    ClaimStore.appendClaims(spark, root, hashes(0 until 100), "h", 0L)
    ClaimStore.fold(spark, root, "h", 0L)
    ClaimStore.appendClaims(spark, root, hashes(100 until 150), "h", 1L)
    val resized = ClaimStore.Config(bloomItems = 1000000)
    ClaimStore.fold(spark, root, "h", 1L, resized)
    assert(seenSet(root, 0 until 200, 2L, resized) == hashSet(0 until 150))
    ClaimStore.Metrics.reset()
    assert(seenSet(root, 500 until 520, 2L, resized).isEmpty)
    assert(ClaimStore.Metrics.plannedSeenBytes.get == 0L)
  }

  test("chunk selection is bounded by content, not LSM run count") {
    val root = tmp("cs8")
    // five folds -> five sorted runs, EACH spanning the full md5 range
    for (b <- 0 until 5) {
      ClaimStore.appendClaims(spark, root, hashes(b * 100 until (b + 1) * 100), "h", b.toLong)
      ClaimStore.fold(spark, root, "h", b.toLong)
    }
    val base = SnapTable.snapshot(spark, root).get.files.filter(_.tag.contains("base"))
    assert(base.size == 5, s"expected 5 runs, got ${base.size}")
    // every run's [lo,hi] overlaps every probe (full-range runs), so
    // bounds-only pruning would select ALL runs; the per-chunk Bloom
    // must select exactly the one run that CONTAINS the positive
    ClaimStore.Metrics.reset()
    assert(seenSet(root, Seq(42), 5L) == hashSet(Seq(42))) // claimed by batch 0's run
    assert(ClaimStore.Metrics.baseFilesSelected.get == 1L,
      s"selected ${ClaimStore.Metrics.baseFilesSelected.get} of ${base.size} runs")
    // two positives from two different runs -> exactly two
    ClaimStore.Metrics.reset()
    assert(seenSet(root, Seq(42, 342), 5L) == hashSet(Seq(42, 342)))
    assert(ClaimStore.Metrics.baseFilesSelected.get == 2L)
  }

  test("run count stays capped under maxRuns via size-tiered merges, answers exact") {
    val root = tmp("cs10")
    val cfg = ClaimStore.Config(maxRuns = 3)
    def runCount: Int = SnapTable.snapshot(spark, root).get.files
      .filter(_.tag.contains("base"))
      .groupBy(e => new org.apache.hadoop.fs.Path(e.path).getName.takeWhile(_ != '-'))
      .size
    // ten fold cycles; uncapped this would be ten runs
    for (b <- 0 until 10) {
      ClaimStore.appendClaims(spark, root, hashes(b * 50 until (b + 1) * 50), "h", b.toLong)
      ClaimStore.fold(spark, root, "h", b.toLong, cfg)
      assert(runCount <= 3, s"after fold $b: $runCount runs")
    }
    // claims survive every merge, exactly once each
    val all = SnapTable.read(spark, root).select("h")
    assert(all.count() == 500 && all.distinct().count() == 500)
    // seen set exact THROUGH the merged base (Bloom healed over merges)
    assert(seenSet(root, 0 until 600, 10L, cfg) == hashSet(0 until 500))
    // and a fresh batch still reads zero base bytes
    ClaimStore.Metrics.reset()
    assert(seenSet(root, 1000 until 1050, 10L, cfg).isEmpty)
    assert(ClaimStore.Metrics.plannedSeenBytes.get == 0L)
    assert(ClaimStore.Metrics.fullFallbacks.get == 0L,
      "merged chunks must be Bloom-covered after the fold that merged them")
  }

  test("chunk filters are per-chunk files; a torn one degrades to bounds and heals") {
    val root = tmp("cs11")
    ClaimStore.appendClaims(spark, root, hashes(0 until 2000), "h", 0L)
    val cfg = ClaimStore.Config(foldTargetBytes = 4096)
    ClaimStore.fold(spark, root, "h", 0L, cfg)
    val base = SnapTable.snapshot(spark, root).get.files.filter(_.tag.contains("base"))
    val bfDir = new java.io.File(s"$root/bloomchunks")
    def bfFiles = bfDir.listFiles().filter(_.getName.endsWith(".bf"))
    assert(bfFiles.length == base.size,
      s"expected one filter file per chunk: ${bfFiles.length} vs ${base.size}")
    // bloom.bin is header + GLOBAL filter only (no embedded chunk blobs)
    val header = {
      val in = new java.io.BufferedReader(new java.io.FileReader(s"$root/bloom.bin"))
      try in.readLine() finally in.close()
    }
    assert(!header.contains("\"chunks\""), "bloom.bin must not embed chunk blobs")
    // corrupt THREE chunk filters, one per failure shape — each must
    // degrade to bounds for its chunk (the positive is still found),
    // be deleted on read, and heal at the next fold; others unaffected
    assert(bfFiles.length >= 3, s"need 3 victims, have ${bfFiles.length}")
    val victims = bfFiles.sortBy(_.getName).take(3)
    // hand-editing bypasses Hadoop's local-FS .crc sidecars, which would
    // otherwise intercept every read as a ChecksumException BEFORE the
    // trailer-CRC / parse branches under test — drop them so the
    // store's own validation is what runs
    def dropFsCrc(v: java.io.File): Unit =
      new java.io.File(v.getParentFile, s".${v.getName}.crc").delete()
    // (a) short write: under the 9-byte blob+trailer minimum
    java.nio.file.Files.writeString(victims(0).toPath, "torn")
    dropFsCrc(victims(0))
    // (b) CRC mismatch: flip a blob byte, keep length and trailer
    locally {
      val b = java.nio.file.Files.readAllBytes(victims(1).toPath)
      b(0) = (b(0) ^ 0xff).toByte
      java.nio.file.Files.write(victims(1).toPath, b)
      dropFsCrc(victims(1))
    }
    // (c) CRC-VALID garbage: unparseable as a BloomFilter — the parse
    // failure must degrade like a CRC failure, never wedge the stream
    locally {
      val blob = Array.fill[Byte](32)(0x5a)
      val crc = new java.util.zip.CRC32
      crc.update(blob)
      val trailer = java.nio.ByteBuffer.allocate(8).putLong(crc.getValue).array()
      java.nio.file.Files.write(victims(2).toPath, blob ++ trailer)
      dropFsCrc(victims(2))
    }
    assert(seenSet(root, 0 until 2000, 1L, cfg) == hashSet(0 until 2000))
    victims.foreach(v =>
      assert(!v.exists(), s"corrupt chunk filter ${v.getName} must be deleted on read"))
    ClaimStore.appendClaims(spark, root, hashes(2000 until 2100), "h", 1L)
    ClaimStore.fold(spark, root, "h", 1L, cfg)
    assert(bfFiles.length ==
      SnapTable.snapshot(spark, root).get.files.count(_.tag.contains("base")),
      "heal must restore one filter file per chunk")
    assert(seenSet(root, 0 until 2200, 2L, cfg) == hashSet(0 until 2100))
  }

  test("model check: random append/fold/merge/replay sequences keep seen-sets exact") {
    for (trial <- 0 until 2) {
      val rnd = new scala.util.Random(7100 + trial)
      val root = tmp(s"csm$trial")
      // tiny fold target + low run cap: every structural path (many
      // chunks, size-tiered merges, bloom heals) exercises per trial
      val cfg = ClaimStore.Config(foldTargetBytes = 4096, maxRuns = 3)
      var claimed = Set.empty[Int] // reference model
      for (step <- 0 until 12) {
        val b = step.toLong
        // probe a random mix BEFORE appending: batch b sees exactly the
        // model's claims (all earlier batches), regardless of fold state
        val probe = Seq.fill(60)(rnd.nextInt(3000)).distinct
        assert(seenSet(root, probe, b, cfg) == hashSet(probe.filter(claimed)),
          s"trial $trial step $step")
        // the caller's contract: append only NEW claims (the write path
        // upstream anti-joins), deduped in-batch
        val newIds = Seq.fill(rnd.nextInt(50))(rnd.nextInt(3000))
          .distinct.filterNot(claimed)
        ClaimStore.appendClaims(spark, root, hashes(newIds), "h", b)
        claimed ++= newIds
        if (rnd.nextInt(3) == 0) ClaimStore.fold(spark, root, "h", b, cfg)
        if (rnd.nextInt(4) == 0) // replay of an already-committed batch
          ClaimStore.appendClaims(spark, root, hashes(newIds), "h", b)
      }
      // final exactness over the whole key space, and global distinctness
      assert(seenSet(root, 0 until 3000, 12L, cfg) == hashSet(claimed.toSeq))
      val all = SnapTable.read(spark, root).select("h")
      assert(all.count() == claimed.size && all.distinct().count() == claimed.size)
    }
  }

  test("a pre-SnapTable batch-partitioned layout is imported once, claims honored") {
    import spark.implicits._
    val root = tmp("cs9")
    // fabricate the OLD layout: batch=0 / batch=1 claim dirs plus a
    // folded base at batch=-1, no SnapTable meta
    hashes(0 until 10).write.parquet(s"$root/batch=-1") // folded (batches before 0)
    hashes(10 until 20).write.parquet(s"$root/batch=0")
    hashes(20 until 30).write.parquet(s"$root/batch=1")
    // first touch migrates: watermark = max legacy batch, claims exact
    assert(ClaimStore.lastBatch(spark, root).contains(1L))
    assert(seenSet(root, 0 until 40, 2L) == hashSet(0 until 30))
    // replay exclusion survives the import: batch 1 replayed must not
    // see its own claims, but must see base + batch 0
    assert(seenSet(root, 0 until 40, 1L) == hashSet(0 until 20))
    // its replayed append is watermark-skipped, not duplicated
    val head = SnapTable.snapshot(spark, root).get.id
    ClaimStore.appendClaims(spark, root, hashes(20 until 30), "h", 1L)
    assert(SnapTable.snapshot(spark, root).get.id == head)
    val all = SnapTable.read(spark, root).select("h")
    assert(all.count() == 30 && all.distinct().count() == 30)
    // new batches append and fold normally on top
    ClaimStore.appendClaims(spark, root, hashes(30 until 35), "h", 2L)
    ClaimStore.fold(spark, root, "h", 2L)
    assert(seenSet(root, 0 until 40, 3L) == hashSet(0 until 35))
  }

  test("a crash mid legacy import resumes; duplicate legacy claims import distinct") {
    import spark.implicits._
    val root = tmp("cs13")
    hashes(0 until 10).write.parquet(s"$root/batch=-1")
    hashes(10 until 20).write.parquet(s"$root/batch=0")
    // legacy crash caveat: batch=1 overlaps earlier dirs (5..19) plus
    // in-dir duplicates of its own
    hashes((5 until 25) ++ (20 until 25)).write.parquet(s"$root/batch=1")
    // simulate the interrupted first import: only batch=-1 landed
    // before the crash (meta/ EXISTS — the resume gate must be the
    // watermark, not meta existence)
    SnapTable.append(spark, root, hashes(0 until 10),
      watermark = Some("-1"), tag = Some("b:-1"), exactStats = false)
    // first ClaimStore touch resumes the import for batches 0 and 1
    assert(ClaimStore.lastBatch(spark, root).contains(1L))
    assert(seenSet(root, 0 until 40, 2L) == hashSet(0 until 25))
    // replay exclusion intact after resume
    assert(seenSet(root, 0 until 40, 1L) == hashSet(0 until 20))
    // the overlap imported exactly once: claims stay globally distinct
    val all = SnapTable.read(spark, root).select("h")
    assert(all.count() == 25 && all.distinct().count() == 25)
  }

  test("empty claim append is a pure watermark bump; fold with nothing to fold is a no-op") {
    val root = tmp("cs7")
    ClaimStore.appendClaims(spark, root, hashes(Nil), "h", 0L)
    assert(ClaimStore.lastBatch(spark, root).contains(0L))
    assert(SnapTable.snapshot(spark, root).get.files.isEmpty)
    assert(seenSet(root, 0 until 10, 1L).isEmpty)
    ClaimStore.fold(spark, root, "h", 0L) // no files: must not throw
    ClaimStore.appendClaims(spark, root, hashes(0 until 5), "h", 1L)
    assert(seenSet(root, 0 until 10, 2L) == hashSet(0 until 5))
  }
}
