package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.SnapTable

class SnapTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/tbl"

  import TestSnapKnobs.withCheckpointEvery

  test("append/read roundtrip, lineage, and watermark resume") {
    import spark.implicits._
    val root = tmp("snap1")
    val s1 = SnapTable.append(spark, root,
      (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "v"),
      watermark = Some("batch-0"))
    assert(s1.id == 1L && s1.op == "append" && s1.removed.isEmpty)
    assert(s1.files.map(_.rows).sum == 100)
    val s2 = SnapTable.append(spark, root,
      (101 to 150).map(i => (i.toLong, s"row$i")).toDF("id", "v"),
      watermark = Some("batch-1"))
    assert(s2.id == 2L && s2.files.map(_.rows).sum == 150)
    assert(s2.added.nonEmpty && s2.added.toSet.intersect(s1.added.toSet).isEmpty)
    // the resume point is the last COMMITTED watermark
    assert(SnapTable.lastWatermark(spark, root).contains("batch-1"))
    val got = SnapTable.read(spark, root).select("id").as[Long].collect().toSet
    assert(got == (1L to 150L).toSet)
    // append without a watermark inherits the parent's
    SnapTable.append(spark, root, Seq((151L, "x")).toDF("id", "v"))
    assert(SnapTable.lastWatermark(spark, root).contains("batch-1"))
  }

  test("time travel: every snapshot stays readable until expired") {
    import spark.implicits._
    val root = tmp("snap2")
    SnapTable.append(spark, root, Seq((1L, "a")).toDF("id", "v"))
    SnapTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
    SnapTable.overwrite(spark, root, Seq((9L, "z")).toDF("id", "v"))
    assert(SnapTable.snapshotIds(spark, root) == Seq(1L, 2L, 3L))
    def ids(asOf: Long) = SnapTable.read(spark, root, Some(asOf))
      .select("id").as[Long].collect().toSet
    assert(ids(1) == Set(1L))
    assert(ids(2) == Set(1L, 2L))
    assert(ids(3) == Set(9L))
    intercept[IllegalArgumentException] { SnapTable.read(spark, root, Some(7L)) }
  }

  test("rewrite: snapshot-isolated compaction — old readers consistent, data identical") {
    import spark.implicits._
    val root = tmp("snap3")
    for (b <- 0 until 6)
      SnapTable.append(spark, root,
        (0 until 50).map(i => ((b * 50 + i).toLong, s"v$b-$i")).toDF("id", "v"),
        statsCol = Some("id"))
    val before = SnapTable.snapshot(spark, root).get
    assert(before.id == 6L)
    val nFilesBefore = before.files.length
    // a reader resolved BEFORE the rewrite...
    val oldView = SnapTable.read(spark, root, Some(before.id))
    val compacted = SnapTable.rewrite(spark, root,
      pick = _ => true,
      rewriteAs = _.repartition(1).sortWithinPartitions("id"),
      statsCol = Some("id")).get
    assert(compacted.op == "rewrite" && compacted.files.length == 1)
    assert(compacted.removed.length == nFilesBefore)
    // ...still sees its full consistent state (old files live until expire)
    assert(oldView.count() == 300)
    assert(SnapTable.read(spark, root, Some(before.id)).count() == 300)
    // and the compacted head holds exactly the same rows
    val now = SnapTable.read(spark, root).select("id").as[Long].collect().toSet
    assert(now == (0L until 300L).toSet)
    assert(SnapTable.read(spark, root).inputFiles.length == 1)
  }

  test("bounds pruning: manifest-side file skipping with parsed numeric bounds") {
    import spark.implicits._
    val root = tmp("snap4")
    // range-clustered on id -> per-file bounds are tight and disjoint
    SnapTable.append(spark, root,
      (0 until 400).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      statsCol = Some("id"), clusterFiles = 4)
    val snap = SnapTable.snapshot(spark, root).get
    assert(snap.files.forall(f => f.lo.isDefined && f.hi.isDefined))
    assert(snap.files.length > 1, "need multiple files for a pruning test")
    // numeric parse in the prune callback (lexicographic would be wrong)
    val pruned = SnapTable.read(spark, root,
      prune = Some((lo, hi) => lo.toLong <= 10L && 10L <= hi.toLong))
    assert(pruned.inputFiles.length < snap.files.length)
    assert(pruned.filter(col("id") === 10L).count() == 1)
    // pruning is only a file skip, never a row filter
    assert(pruned.count() >= 1)
  }

  test("optimistic concurrency: racing committers all land, nothing lost") {
    import spark.implicits._
    val root = tmp("snap5")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContextExecutor =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val futures = (0 until 8).map { k =>
      Future {
        SnapTable.append(spark, root,
          Seq((k.toLong, s"writer$k")).toDF("id", "v"))
      }
    }
    val snaps = Await.result(Future.sequence(futures), 120.seconds)
    pool.shutdown()
    // dense ids 1..8, every writer's commit retained
    assert(snaps.map(_.id).sorted == (1L to 8L))
    val ids = SnapTable.read(spark, root).select("id").as[Long].collect().toSet
    assert(ids == (0L until 8L).toSet)
    assert(SnapTable.snapshot(spark, root).get.files.map(_.rows).sum == 8)
  }

  test("rewrite conflict: aborts cleanly instead of resurrecting removed files") {
    import spark.implicits._
    val root = tmp("snap6")
    SnapTable.append(spark, root, (0 until 10).map(i => (i.toLong, "a")).toDF("id", "v"))
    // the conflicting overwrite lands while the rewrite is staging
    val res = SnapTable.rewrite(spark, root,
      pick = _ => true,
      rewriteAs = { df =>
        val materialized = df.collect() // read victims BEFORE they are dropped
        SnapTable.overwrite(spark, root,
          Seq((99L, "new")).toDF("id", "v"))
        spark.createDataFrame(
          spark.sparkContext.parallelize(materialized.toIndexedSeq), df.schema)
      })
    assert(res.isEmpty, "conflicting rewrite must abort")
    // the overwrite won; the aborted rewrite resurrected nothing
    val ids = SnapTable.read(spark, root).select("id").as[Long].collect().toSet
    assert(ids == Set(99L))
    assert(SnapTable.snapshot(spark, root).get.op == "overwrite")
  }

  test("torn state is invisible: tmp manifests and stage orphans are ignored") {
    withCheckpointEvery(1) { // pins EXACT keepLast retention boundaries
    import spark.implicits._
    val root = tmp("snap7")
    SnapTable.append(spark, root, Seq((1L, "a")).toDF("id", "v"))
    // simulate a crash mid-commit: a leftover manifest tmp...
    val torn = new java.io.File(s"$root/meta/snap-00000002.json.tmp-deadbeef")
    java.nio.file.Files.writeString(torn.toPath, "{\"id\":2,TRUNCATED")
    // ...and an abandoned stage directory
    new java.io.File(s"$root/.stage-crashed").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/.stage-crashed/part-0.parquet"), "junk")
    assert(SnapTable.snapshotIds(spark, root) == Seq(1L))
    assert(SnapTable.read(spark, root).count() == 1)
    // the next commit proceeds normally at v2
    val s2 = SnapTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
    assert(s2.id == 2L)
    assert(SnapTable.read(spark, root).count() == 2)
    // torn manifests under their COMMITTED name (non-atomic rename fs):
    // truncated json at v3, valid-json-wrong-crc at v4 — readers fall
    // back to the last parseable snapshot, commits step OVER dead ids
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/meta/snap-00000003.json"), "{\"id\":3,TRUNC")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/meta/snap-00000004.json"),
      "{\"id\":4,\"op\":\"append\",\"watermark\":null,\"added\":[]," +
        "\"removed\":[],\"files\":[]}\ncrc:1\n")
    assert(SnapTable.snapshot(spark, root).get.id == 2L)
    assert(SnapTable.read(spark, root).count() == 2)
    intercept[IllegalArgumentException] { SnapTable.read(spark, root, Some(3L)) }
    val s5 = SnapTable.append(spark, root, Seq((3L, "c")).toDF("id", "v"))
    assert(s5.id == 5L, s"commit must step over dead ids, got ${s5.id}")
    assert(SnapTable.read(spark, root).count() == 3)
    // expire sweeps the dead ids along with old snapshots
    SnapTable.expire(spark, root, keepLast = 1)
    assert(SnapTable.snapshotIds(spark, root) == Seq(5L))
    assert(SnapTable.read(spark, root).count() == 3)
    }
  }

  test("HEAD hint is an optimization only: absent/corrupt/stale/forged hints never misplace a commit") {
    import spark.implicits._
    val root = tmp("snap12")
    for (i <- 1 to 3)
      SnapTable.append(spark, root, Seq((i.toLong, "x")).toDF("id", "v"))
    val hint = java.nio.file.Paths.get(s"$root/meta/HEAD")
    // hand-edits bypass Hadoop's local-FS .crc sidecar; drop it so the
    // hint READ path (not a ChecksumException fallback) is what runs
    def setHint(s: String): Unit = {
      java.nio.file.Files.writeString(hint, s)
      new java.io.File(s"$root/meta/.HEAD.crc").delete()
    }
    assert(java.nio.file.Files.readString(hint).trim == "v:3",
      "a successful commit must refresh the hint")
    // READER head resolution under a bad hint (snapshot(None) is also
    // hint-served now): each shape must still see the true head
    def readerHead: Long = SnapTable.snapshot(spark, root).get.id
    // corrupt hint -> full-listing fallback, commit lands at 4, hint heals
    setHint("garbage")
    assert(readerHead == 3L, "corrupt hint must not blind a reader")
    assert(SnapTable.append(spark, root, Seq((4L, "x")).toDF("id", "v")).id == 4L)
    assert(java.nio.file.Files.readString(hint).trim == "v:4")
    // stale-LOW hint (crash between publish and hint write): the
    // forward probe must find the true head
    setHint("v:1")
    assert(readerHead == 4L, "stale-low hint must forward-probe to the head")
    setHint("v:1")
    assert(SnapTable.append(spark, root, Seq((5L, "x")).toDF("id", "v")).id == 5L)
    // forged hint past the head (or pointing at an expired id): the
    // parse scan declines it
    setHint("v:99")
    assert(readerHead == 5L, "forged-high hint must fall back to the listing")
    setHint("v:99")
    assert(SnapTable.append(spark, root, Seq((6L, "x")).toDF("id", "v")).id == 6L)
    // absent hint
    java.nio.file.Files.delete(hint)
    assert(readerHead == 6L)
    java.nio.file.Files.deleteIfExists(hint) // readerHead does not write it
    assert(SnapTable.append(spark, root, Seq((7L, "x")).toDF("id", "v")).id == 7L)
    // state is intact through all of it
    assert(SnapTable.snapshotIds(spark, root) == (1L to 7L))
    assert(SnapTable.read(spark, root).select("id").as[Long].collect().toSet ==
      (1L to 7L).toSet)
    // expire then a hint below the retained window: fallback again
    SnapTable.expire(spark, root, keepLast = 2)
    setHint("v:1")
    assert(SnapTable.append(spark, root, Seq((8L, "x")).toDF("id", "v")).id == 8L)
    assert(SnapTable.read(spark, root).count() == 8)
  }

  test("an expired cursor with intact lineage recovers; torn ids sweep even without drops") {
    import spark.implicits._
    val root = tmp("snap13")
    withCheckpointEvery(3) {
    for (i <- 1 to 6)
      SnapTable.append(spark, root, Seq((i.toLong, "x")).toDF("id", "v"))
    // checkpoints at 1 and 4 (K=3): the keepLast=2 cut extends down to
    // the nearest checkpoint, retaining {4, 5, 6}
    SnapTable.expire(spark, root, keepLast = 2)
    assert(SnapTable.snapshotIds(spark, root) == Seq(4L, 5L, 6L))
    // cursor 4 retained: exact incremental recovery
    val ch = SnapTable.changesBetween(spark, root, 4L)
    assert(ch.coveredThrough == 6L)
    assert(ch.rows.get.select("id").as[Long].collect().toSet == Set(5L, 6L))
    // cursor 3 was just expired, but (3, 6] lineage is fully retained:
    // the consumer one keep-window behind is exactly recoverable
    assert(SnapTable.changesBetween(spark, root, 3L).rows.get
      .select("id").as[Long].collect().toSet == Set(4L, 5L, 6L))
    // cursor 2 needs snapshot 3's lineage, which is gone: loud
    intercept[IllegalArgumentException] { SnapTable.changesBetween(spark, root, 2L) }
    }
    // torn-id sweep no longer depends on a drop happening: a burned
    // slot below the parseable head goes even at keepLast > count
    val root2 = tmp("snap14")
    SnapTable.append(spark, root2, Seq((1L, "a")).toDF("id", "v"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root2/meta/snap-00000002.json"), "{\"id\":2,TORN")
    SnapTable.append(spark, root2, Seq((2L, "b")).toDF("id", "v")) // lands at 3
    SnapTable.expire(spark, root2, keepLast = 10)
    assert(SnapTable.snapshotIds(spark, root2) == Seq(1L, 3L),
      "burned torn slot below the head must be swept")
    // with the poison gone, the full-genesis replay works again
    val all = SnapTable.changesBetween(spark, root2, 0L)
    assert(all.rows.get.select("id").as[Long].collect().toSet == Set(1L, 2L))
    // a stray non-numeric snap file must not brick the table
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root2/meta/snap-00000003.bak.json"), "junk")
    assert(SnapTable.snapshotIds(spark, root2) == Seq(1L, 3L))
    assert(SnapTable.append(spark, root2, Seq((9L, "c")).toDF("id", "v")).id == 4L)
  }

  test("a swept burned slot cannot make a stale HEAD hint resolve a stale head") {
    import spark.implicits._
    val root = tmp("snap15")
    for (i <- 1 to 3)
      SnapTable.append(spark, root, Seq((i.toLong, "x")).toDF("id", "v"))
    // burn slot 4: a crashed publish left a torn manifest under its
    // committed name (non-atomic-rename filesystem); commits step over
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/meta/snap-00000004.json"), "{\"id\":4,TORN")
    for (_ <- 0 until 2)
      SnapTable.append(spark, root, Seq((9L, "y")).toDF("id", "v")) // -> 5, 6
    def setHint(v: Long): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/meta/HEAD"), s"v:$v\n")
      new java.io.File(s"$root/meta/.HEAD.crc").delete() // hadoop local-fs checksum
    }
    def hint(): String = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/meta/HEAD")).trim
    // the exact crash shape: hint never advanced past an old publish
    setHint(2L)
    // expire sweeps burned slot 4 (punching a hole at an id a stale
    // probe could stop at) — it must lift the hint to the head FIRST
    SnapTable.expire(spark, root, keepLast = 10)
    assert(!new java.io.File(s"$root/meta/snap-00000004.json").exists(),
      "burned slot must still sweep")
    assert(hint() == "v:6", s"hint not refreshed before the sweep: ${hint()}")
    assert(SnapTable.snapshot(spark, root).get.id == 6L)
    // second line of defense: a hint that went stale-low AFTER the
    // sweep (another writer's crash) must not stop its forward probe
    // at the hole — hole detection bails to the full listing
    setHint(2L)
    assert(SnapTable.snapshot(spark, root).get.id == 6L,
      "stale hint + swept hole resolved a stale head")
    // ADJACENT burned slots (repeated crashed publishes between two
    // successful ones) punch a hole wider than the probe's one-slot
    // look-ahead — which is exactly why the sweep is gated on a
    // verified hint at/above the head: any hint written after the
    // sweep is above the hole by id monotonicity
    val root2 = tmp("snap16")
    for (i <- 1 to 3)
      SnapTable.append(spark, root2, Seq((i.toLong, "x")).toDF("id", "v"))
    for (b <- 4 to 5)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(
        f"$root2/meta/snap-$b%08d.json"), s"""{"id":$b,TORN""")
    SnapTable.append(spark, root2, Seq((9L, "y")).toDF("id", "v")) // -> 6
    // the crash shape again: hint stuck at an old publish
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root2/meta/HEAD"), "v:2\n")
    new java.io.File(s"$root2/meta/.HEAD.crc").delete()
    SnapTable.expire(spark, root2, keepLast = 10)
    assert(!new java.io.File(f"$root2/meta/snap-${4}%08d.json").exists())
    assert(!new java.io.File(f"$root2/meta/snap-${5}%08d.json").exists())
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root2/meta/HEAD")).trim == "v:6")
    assert(SnapTable.snapshot(spark, root2).get.id == 6L,
      "adjacent burned slots + stale hint resolved a stale head")
  }

  test("damage BELOW the cut never bricks expire; first-cut delta key shape still reads") {
    import spark.implicits._
    import TestSnapKnobs.withCheckpointEvery
    val root = tmp("snap19")
    withCheckpointEvery(3) {
      for (i <- 1 to 8) // checkpoints 1,4,7; deltas 2,3,5,6,8
        SnapTable.append(spark, root, Seq((i.toLong, "x")).toDF("id", "v"))
      // rot a delta deep in history: head reads are unaffected (its
      // chain is above), and expire must STILL work — the kept chains
      // don't depend on it, and "expire the table past it" is exactly
      // the recovery the error message advertises for kept-range damage
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/meta/snap-00000002.json"), "{\"id\":2,ROT")
      new java.io.File(s"$root/meta/.snap-00000002.json.crc").delete()
      assert(SnapTable.read(spark, root).count() == 8)
      SnapTable.expire(spark, root, keepLast = 2) // cut at checkpoint 7
      assert(SnapTable.snapshotIds(spark, root) == Seq(7L, 8L))
      assert(SnapTable.read(spark, root).count() == 8) // data intact
      // first-cut r8 deltas carried their files under "files" (+ an
      // explicit "added"); the parser keeps reading that shape
      val m8 = java.nio.file.Paths.get(s"$root/meta/snap-00000008.json")
      val lines = java.nio.file.Files.readString(m8).split("\n")
      val oldShape = lines(0).replace("\"adds\":", "\"files\":")
      assert(oldShape != lines(0))
      val crc = new java.util.zip.CRC32
      crc.update(oldShape.getBytes("UTF-8"))
      java.nio.file.Files.writeString(m8, s"$oldShape\ncrc:${crc.getValue}\n")
      new java.io.File(s"$root/meta/.snap-00000008.json.crc").delete()
      assert(SnapTable.snapshot(spark, root).get.id == 8L)
      assert(SnapTable.read(spark, root).count() == 8)
    }
  }

  test("model check: random append/overwrite/rewrite/expire sequences match a reference model") {
    import spark.implicits._
    // checkpointEvery=2 forces the delta/checkpoint boundary on nearly
    // every commit, so every structural path (delta resolution, cut
    // alignment, overwrite reset) is crossed repeatedly
    withCheckpointEvery(2) {
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(4242 + trial)
      val root = tmp(s"snapm$trial")
      var model = Set.empty[Long] // current table content (ids unique per insert)
      var nextId = 0L
      var history = Vector.empty[(Long, Set[Long])] // snapshot id -> content
      def freshIds(n: Int): Seq[Long] = {
        val ids = (nextId until nextId + n).toSeq; nextId += n; ids
      }
      def readIds(asOf: Option[Long]): Set[Long] =
        SnapTable.read(spark, root, asOf).select("id").as[Long].collect().toSet
      for (_ <- 0 until 10) {
        rnd.nextInt(4) match {
          case 0 =>
            val ids = freshIds(1 + rnd.nextInt(5))
            val s = SnapTable.append(spark, root, ids.toDF("id"))
            model ++= ids; history :+= (s.id -> model)
          case 1 =>
            val ids = freshIds(1 + rnd.nextInt(3))
            val s = SnapTable.overwrite(spark, root, ids.toDF("id"))
            model = ids.toSet; history :+= (s.id -> model)
          case 2 => // compaction must never change content
            SnapTable.rewrite(spark, root, _ => true, _.repartition(1))
              .foreach(s => history :+= (s.id -> model))
          case 3 if history.size > 2 =>
            val keep = 1 + rnd.nextInt(history.size)
            SnapTable.expire(spark, root, keep)
            history = history.takeRight(keep)
          case _ => ()
        }
        // invariants: head matches the model; ALL retained history is
        // still exactly readable (snapshot isolation + GC safety)
        if (history.nonEmpty) {
          assert(readIds(None) == model, s"head mismatch at trial $trial")
          for ((sid, ids) <- history)
            assert(readIds(Some(sid)) == ids, s"snapshot $sid mismatch at trial $trial")
        }
      }
    }
    }
  }

  test("delta manifests: O(commit) deltas, checkpoint cadence, resolution, aligned expire") {
    import spark.implicits._
    val root = tmp("snap17")
    def manifest(v: Long): String = java.nio.file.Files.readString(
      java.nio.file.Paths.get(f"$root/meta/snap-$v%08d.json"))
    withCheckpointEvery(3) {
      for (i <- 1 to 7)
        SnapTable.append(spark, root, Seq((i.toLong, "x")).toDF("id", "v"))
      // cadence: 1 full, 2-3 deltas, 4 full, 5-6 deltas, 7 full
      for (v <- Seq(1L, 4L, 7L))
        assert(!manifest(v).contains("\"depth\""), s"snap $v should be full")
      for (v <- Seq(2L, 3L, 5L, 6L))
        assert(manifest(v).contains("\"depth\""), s"snap $v should be a delta")
      // the O(commit-delta) witness: a delta manifest lists ONE file
      // (this commit's), a checkpoint lists the table's seven
      assert(manifest(6).length < manifest(7).length,
        s"${manifest(6).length} !< ${manifest(7).length}")
      assert("\"path\"".r.findAllIn(manifest(6)).size == 1)
      assert("\"path\"".r.findAllIn(manifest(7)).size == 7)
      // resolution: the head and a mid-chain time travel are complete
      def ids(asOf: Option[Long]) = SnapTable.read(spark, root, asOf)
        .select("id").as[Long].collect().toSet
      assert(ids(None) == (1L to 7L).toSet)
      assert(ids(Some(3L)) == (1L to 3L).toSet) // resolved via 1 <- 2 <- 3
      assert(SnapTable.snapshot(spark, root).get.depth == 0)
      assert(SnapTable.snapshot(spark, root, Some(6L)).get.depth == 2)
      // expire cuts at a checkpoint so retained deltas keep resolving:
      // keepLast=2 extends down to full snap 4 (wait... 7 is full, so
      // the cut lands exactly at keepLast here) — use keepLast=3 to
      // force the walk: cut index at snap 5 (delta) walks down to 4
      SnapTable.expire(spark, root, keepLast = 3)
      assert(SnapTable.snapshotIds(spark, root) == Seq(4L, 5L, 6L, 7L))
      assert(ids(None) == (1L to 7L).toSet)
      assert(ids(Some(5L)) == (1L to 5L).toSet)
      assert(SnapTable.changesBetween(spark, root, 5L).rows.get
        .select("id").as[Long].collect().toSet == Set(6L, 7L))
      // delta shape: a pre-delta reader must fail its parse (torn) on a
      // delta rather than serve its partial file list as the table —
      // the files live under a DIFFERENT key, and "added" (derivable)
      // is not written twice
      assert(manifest(6).contains("\"adds\""))
      assert(!manifest(6).contains("\"files\"") && !manifest(6).contains("\"added\""))
      assert(manifest(7).contains("\"files\"") && !manifest(7).contains("\"adds\""))
      // an overwrite resets the chain with a full checkpoint
      val ow = SnapTable.overwrite(spark, root, Seq((99L, "y")).toDF("id", "v"))
      assert(ow.depth == 0 && !manifest(ow.id).contains("\"depth\""))
      assert(ids(None) == Set(99L))
    }
  }

  test("a damaged checkpoint is LOUD, never a silent head rewind or sweep") {
    import spark.implicits._
    import TestSnapKnobs.withCheckpointEvery
    val root = tmp("snap18")
    withCheckpointEvery(3) {
      for (i <- 1 to 6) // checkpoints at 1 and 4; 5-6 are deltas on 4
        SnapTable.append(spark, root, Seq((i.toLong, "x")).toDF("id", "v"))
      val cp = java.nio.file.Paths.get(s"$root/meta/snap-00000004.json")
      val original = java.nio.file.Files.readAllBytes(cp)
      java.nio.file.Files.writeString(cp, "{\"id\":4,ROT") // bit rot / partial loss
      new java.io.File(s"$root/meta/.snap-00000004.json.crc").delete()
      // head resolution must NOT silently serve snapshot 3 (a rewound
      // watermark would re-admit replayed batches as new), and expire
      // must NOT sweep 5-6 as "torn" (one damaged file would become
      // permanent loss of every commit above it) — both fail loudly,
      // naming the file to restore
      val e1 = intercept[IllegalStateException] { SnapTable.snapshot(spark, root) }
      assert(e1.getMessage.contains("snap-00000004"), e1.getMessage)
      val e2 = intercept[IllegalStateException] {
        SnapTable.expire(spark, root, keepLast = 2)
      }
      assert(e2.getMessage.contains("chain broken"), e2.getMessage)
      // restoring the damaged file fully recovers
      java.nio.file.Files.write(cp, original)
      new java.io.File(s"$root/meta/.snap-00000004.json.crc").delete()
      assert(SnapTable.snapshot(spark, root).get.id == 6L)
      assert(SnapTable.read(spark, root).count() == 6)
      // forged structure (negative depth) is TORN — stepped over, never
      // a partial view served as complete
      val forged = """{"id": 7, "op": "append", "watermark": null, """ +
        """"removed": [], "depth": -1, "parent": 6, "adds": []}"""
      val crc = new java.util.zip.CRC32
      crc.update(forged.getBytes("UTF-8"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/meta/snap-00000007.json"),
        s"$forged\ncrc:${crc.getValue}\n")
      assert(SnapTable.snapshot(spark, root).get.id == 6L)
      assert(SnapTable.read(spark, root).count() == 6)
    }
  }

  test("changesSince: incremental capture, compaction invisible, expired cursor rejected") {
    withCheckpointEvery(1) { // pins EXACT keepLast retention boundaries
    import spark.implicits._
    val root = tmp("snap9")
    def ids(df: Option[org.apache.spark.sql.DataFrame]): Set[Long] =
      df.map(_.select("id").as[Long].collect().toSet).getOrElse(Set.empty)
    SnapTable.append(spark, root, (0L until 10L).toDF("id"))
    val s2 = SnapTable.append(spark, root, (10L until 20L).toDF("id"))
    assert(ids(SnapTable.changesSince(spark, root, 0)) == (0L until 20L).toSet)
    val cursor = s2.id
    assert(SnapTable.changesSince(spark, root, cursor).isEmpty)
    // compaction rewrites every file but adds NO rows — invisible to
    // the incremental consumer (no double-count of compacted data)
    SnapTable.rewrite(spark, root, _ => true, _.repartition(1))
    assert(SnapTable.changesSince(spark, root, cursor).isEmpty)
    SnapTable.append(spark, root, (20L until 25L).toDF("id"))
    assert(ids(SnapTable.changesSince(spark, root, cursor)) == (20L until 25L).toSet)
    // expiry retains {3,4}: cursor 2's own manifest is gone but its
    // LINEAGE (3,4] is intact, so it recovers exactly (3 is the
    // row-less rewrite, 4 added 20..25)...
    SnapTable.expire(spark, root, keepLast = 2)
    assert(ids(SnapTable.changesSince(spark, root, cursor)) == (20L until 25L).toSet)
    // ...while a cursor whose lineage is truly expired fails loudly
    intercept[IllegalArgumentException] {
      SnapTable.changesSince(spark, root, cursor - 1)
    }
    // full-read re-sync still consistent
    assert(SnapTable.read(spark, root).count() == 25)
    }
  }

  test("expire: drops old manifests, GCs orphan data, keeps live files") {
    withCheckpointEvery(1) { // pins EXACT keepLast retention boundaries
    import spark.implicits._
    val root = tmp("snap8")
    SnapTable.append(spark, root, (0 until 20).map(i => (i.toLong, "a")).toDF("id", "v"))
    SnapTable.append(spark, root, (20 until 40).map(i => (i.toLong, "b")).toDF("id", "v"))
    SnapTable.rewrite(spark, root, _ => true, _.repartition(1))
    assert(SnapTable.snapshotIds(spark, root) == Seq(1L, 2L, 3L))
    val liveFiles = SnapTable.snapshot(spark, root).get.files.map(_.path).toSet
    SnapTable.expire(spark, root, keepLast = 1)
    assert(SnapTable.snapshotIds(spark, root) == Seq(3L))
    // pre-rewrite data files are gone, live ones intact, reads still work
    val dataFiles = new java.io.File(s"$root/data").listFiles()
      .map(_.getPath).filter(_.endsWith(".parquet")).toSet
    assert(dataFiles == liveFiles.map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath))
    assert(SnapTable.read(spark, root).count() == 40)
    intercept[IllegalArgumentException] { SnapTable.read(spark, root, Some(1L)) }
    }
  }

  test("changesBetween: covered head advances the cursor safely across a racing writer") {
    import spark.implicits._
    val root = tmp("snap10")
    def ids(df: Option[org.apache.spark.sql.DataFrame]): Set[Long] =
      df.map(_.select("id").as[Long].collect().toSet).getOrElse(Set.empty)
    SnapTable.append(spark, root, (0L until 10L).toDF("id"))
    SnapTable.append(spark, root, (10L until 20L).toDF("id"))
    val c1 = SnapTable.changesBetween(spark, root, 0)
    assert(ids(c1.rows) == (0L until 20L).toSet && c1.coveredThrough == 2L)
    // a writer commits BETWEEN the consumer's read and its next cycle:
    // advancing to coveredThrough neither duplicates nor skips it
    SnapTable.append(spark, root, (20L until 30L).toDF("id"))
    val c2 = SnapTable.changesBetween(spark, root, c1.coveredThrough)
    assert(ids(c2.rows) == (20L until 30L).toSet && c2.coveredThrough == 3L)
    val c3 = SnapTable.changesBetween(spark, root, c2.coveredThrough)
    assert(c3.rows.isEmpty && c3.coveredThrough == 3L)
    // explicit upper bound pins a historical range exactly
    val pinned = SnapTable.changesBetween(spark, root, 1L, Some(2L))
    assert(ids(pinned.rows) == (10L until 20L).toSet && pinned.coveredThrough == 2L)
    val empty = SnapTable.changesBetween(spark, root, 2L, Some(2L))
    assert(empty.rows.isEmpty && empty.coveredThrough == 2L)
    intercept[IllegalArgumentException] {
      SnapTable.changesBetween(spark, root, 1L, Some(99L))
    }
    intercept[IllegalArgumentException] {
      SnapTable.changesBetween(spark, root, 2L, Some(1L))
    }
  }

  test("commit CAS never clobbers: the lost publisher leaves the winner's manifest intact") {
    import spark.implicits._
    val root = tmp("snap11")
    SnapTable.append(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(s"$root/meta/cas-target")
    def writeTmp(content: String): org.apache.hadoop.fs.Path = {
      val t = new org.apache.hadoop.fs.Path(s"$root/meta/.cas-tmp-${content.hashCode}")
      val o = fs.create(t, true); o.write(content.getBytes("UTF-8")); o.close(); t
    }
    // first publisher wins, its tmp is consumed
    val t1 = writeTmp("winner")
    assert(SnapTable.publishNoClobber(fs, spark, t1, dst))
    assert(!fs.exists(t1))
    // second publisher LOSES and the winner's bytes survive — on the
    // local filesystem a plain rename would have silently clobbered
    val t2 = writeTmp("clobberer")
    assert(!SnapTable.publishNoClobber(fs, spark, t2, dst))
    val in = fs.open(dst)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(got == "winner")
  }

  test("expire sweeps aged orphans from crashed appends; fresh and live files survive") {
    import spark.implicits._
    val root = tmp("snap12")
    SnapTable.append(spark, root, (0 until 10).map(i => (i.toLong, "a")).toDF("id", "v"))
    val live = SnapTable.snapshot(spark, root).get.files
      .map(p => new org.apache.hadoop.fs.Path(p.path).getName).toSet
    // simulate a writer that crashed between staging and the CAS:
    // uuid-named data files referenced by NO manifest, plus a stale
    // .stage-* dir
    val dataDir = new java.io.File(s"$root/data")
    val orphanOld = new java.io.File(dataDir, "deadbeef-00000.parquet")
    java.nio.file.Files.writeString(orphanOld.toPath, "stray")
    val orphanFresh = new java.io.File(dataDir, "cafebabe-00000.parquet")
    java.nio.file.Files.writeString(orphanFresh.toPath, "inflight")
    orphanFresh.setLastModified(System.currentTimeMillis()) // fresh: protected by the grace window
    val staleStage = new java.io.File(s"$root/.stage-deadbeef")
    staleStage.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(staleStage, "part-0.parquet").toPath, "x")
    orphanOld.setLastModified(System.currentTimeMillis() - 100000)
    staleStage.setLastModified(System.currentTimeMillis() - 100000)
    SnapTable.expire(spark, root, keepLast = 1, orphanGraceMs = 50000)
    assert(!orphanOld.exists(), "aged orphan data file must be swept")
    assert(!staleStage.exists(), "stale .stage dir must be swept")
    assert(orphanFresh.exists(), "a fresh (possibly in-flight) stage file must survive the grace window")
    val remaining = dataDir.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(live.subsetOf(remaining))
    assert(SnapTable.read(spark, root).count() == 10)
  }

  test("manifest tag round-trips and pre-tag manifests parse as None") {
    import spark.implicits._
    val root = tmp("snap13")
    SnapTable.append(spark, root, Seq((1L, "a")).toDF("id", "v"), tag = Some("b:7"))
    SnapTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
    val files = SnapTable.snapshot(spark, root).get.files
    assert(files.flatMap(_.tag).toSet == Set("b:7"))
    assert(files.count(_.tag.isEmpty) == files.size - files.count(_.tag.isDefined) &&
      files.exists(_.tag.isEmpty))
  }
}
