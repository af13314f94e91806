package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A from-scratch snapshot-manifest table layer over parquet — the
  * engine's stand-in for the Iceberg catalog this sandbox cannot ship
  * (no Iceberg jars; re-checked every round, README "Iceberg note").
  * It provides the SEMANTICS the north star names, implemented from
  * the public table-format playbook (the Iceberg spec and Delta log
  * papers are the published references; this is an original, minimal
  * design — not a port):
  *
  *  - **Atomic commits**: a snapshot is one JSON manifest listing the
  *    table's data files. Committing = writing `snap-<v>.json` via
  *    temp-file + rename guarded by a no-clobber check — the commit
  *    CAS. Two writers racing to version v: exactly one wins, the
  *    loser re-derives from the winner's manifest and retries at v+1
  *    (optimistic concurrency, Iceberg-style). Within one JVM the CAS
  *    is additionally serialized on an intrinsic lock, which makes
  *    local-mode (this sandbox's deployment shape) fully safe;
  *    cross-process safety inherits the filesystem's rename contract
  *    (atomic no-clobber on HDFS — the same reliance Iceberg's
  *    HadoopTableOperations documents).
  *  - **Snapshot isolation**: readers resolve a committed manifest
  *    ONCE and read exactly its file list. Concurrent appends,
  *    overwrites and compactions are invisible — no torn reads; and
  *    [[rewrite]] closes the documented `compactTriples` caveat (a
  *    directory lister seeing old and new files mid-swap).
  *  - **Time travel**: manifests are retained until [[expire]];
  *    `read(asOf = Some(v))` reproduces any historical state.
  *  - **Resumable checkpoints with lineage**: every commit records an
  *    application `watermark` (e.g. last ingested doc_id / batch id)
  *    plus added/removed file lineage; [[lastWatermark]] lets a
  *    restarting job resume exactly after its last COMMITTED snapshot
  *    — the "resume from Iceberg snapshot checkpoints" shape of the
  *    north star. A writer crash before commit leaves only orphan
  *    stage files, never a torn table.
  *
  * Scale shape: manifests hold file-level metadata only (path, rows,
  * bytes, per-file min/max of an optional partition/sort column) —
  * never data. A 10^12-row table at 128MB files is a few-MB manifest,
  * and [[read]]'s bounds pruning drops files manifest-side before
  * Spark lists anything. Data files are immutable and uuid-named, so
  * writers never conflict on data — only on the manifest CAS.
  *
  * Determinism: snapshot ids are dense sequence numbers (no wall
  * clock); manifests serialize file lists sorted by path.
  */
object SnapTable {

  /** One data file's manifest entry. `lo`/`hi` are `CAST(col AS
    * STRING)` bounds of the table's stats column when one was declared
    * at write time (callers parse them back — e.g. `.toInt` for a
    * bucket id — so numeric pruning is not fooled by lexicographic
    * order).
    */
  case class FileEntry(path: String, rows: Long, bytes: Long,
                       lo: Option[String], hi: Option[String])

  /** One committed snapshot: dense id, the COMPLETE file list after
    * this commit, the producing operation, added/removed lineage, and
    * the application watermark at commit time.
    */
  case class Snapshot(id: Long, op: String, files: Vector[FileEntry],
                      added: Vector[String], removed: Vector[String],
                      watermark: Option[String])

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def metaDir(root: String) = new Path(root, "meta")
  private def dataDir(root: String) = new Path(root, "data")
  private def snapPath(root: String, v: Long) =
    new Path(metaDir(root), f"snap-$v%08d.json")

  // ---- manifest (de)serialization (flat JSON, dependency-free) -------

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  private def unesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'u' => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case c => b.append(c); i += 2
        }
      } else { b.append(s(i)); i += 1 }
    }
    b.toString
  }
  private def strOpt(o: Option[String]) =
    o.map(v => s""""${esc(v)}"""").getOrElse("null")

  private def render(s: Snapshot): String = {
    val files = s.files.sortBy(_.path).map(f =>
      s"""{"path":"${esc(f.path)}","rows":${f.rows},"bytes":${f.bytes},""" +
        s""""lo":${strOpt(f.lo)},"hi":${strOpt(f.hi)}}""")
      .mkString("[", ",", "]")
    def arr(xs: Vector[String]) = xs.sorted.map(x => s""""${esc(x)}"""").mkString("[", ",", "]")
    s"""{"id":${s.id},"op":"${esc(s.op)}","watermark":${strOpt(s.watermark)},""" +
      s""""added":${arr(s.added)},"removed":${arr(s.removed)},"files":$files}"""
  }

  private def parse(json: String): Snapshot = {
    // minimal parser for exactly the shape `render` writes (paths must
    // not contain the literal "},{" — uuid-named files never do)
    def after(src: String, name: String): String = {
      val k = s""""$name":"""
      val i = src.indexOf(k)
      require(i >= 0, s"manifest missing $name")
      src.substring(i + k.length)
    }
    def str(src: String, name: String): Option[String] = {
      val rest = after(src, name)
      if (rest.startsWith("null")) None
      else {
        val b = new StringBuilder; var i = 1
        while (rest(i) != '"') {
          if (rest(i) == '\\') { b.append(rest(i)).append(rest(i + 1)); i += 2 }
          else { b.append(rest(i)); i += 1 }
        }
        Some(unesc(b.toString))
      }
    }
    def num(src: String, name: String): Long =
      after(src, name).takeWhile(c => c.isDigit || c == '-').toLong
    def arr(src: String, name: String): Vector[String] = {
      val rest = after(src, name)
      require(rest.startsWith("["), s"bad array $name")
      val body = rest.substring(1, rest.indexOf(']'))
      if (body.isEmpty) Vector.empty
      else body.split(",").toVector.map(s => unesc(s.trim.stripPrefix("\"").stripSuffix("\"")))
    }
    val filesBody = {
      val rest = after(json, "files")
      require(rest.startsWith("["), "bad files array")
      rest.substring(1, rest.lastIndexOf(']'))
    }
    val entries =
      if (filesBody.isEmpty) Vector.empty[FileEntry]
      else filesBody.split("""\},\{""").toVector.map { e0 =>
        val e = (if (e0.startsWith("{")) "" else "{") + e0 + (if (e0.endsWith("}")) "" else "}")
        FileEntry(str(e, "path").get, num(e, "rows"), num(e, "bytes"),
          str(e, "lo"), str(e, "hi"))
      }
    Snapshot(num(json, "id"), str(json, "op").getOrElse(""), entries,
      arr(json, "added"), arr(json, "removed"), str(json, "watermark"))
  }

  // ---- snapshot resolution -------------------------------------------

  /** All committed snapshot ids, ascending (`.tmp`s from interrupted
    * commits are ignored — a crash mid-commit leaves no torn state).
    */
  def snapshotIds(spark: SparkSession, root: String): Seq[Long] = {
    val md = metaDir(root)
    val f = fs(spark, md)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).map(_.getPath.getName)
      .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("snap-").stripSuffix(".json").toLong)
      .sorted.toSeq
  }

  /** The snapshot record for `asOf` (default: latest committed). None
    * for an empty/nonexistent table; IllegalArgumentException for an
    * explicit `asOf` that was never committed or has been expired.
    */
  def snapshot(spark: SparkSession, root: String,
               asOf: Option[Long] = None): Option[Snapshot] = {
    val ids = snapshotIds(spark, root)
    val pick = asOf match {
      case Some(v) =>
        require(ids.contains(v),
          s"no snapshot $v in $root (have ${ids.mkString(",")})")
        Some(v)
      case None => ids.lastOption
    }
    pick.map { v =>
      val p = snapPath(root, v)
      val in = fs(spark, p).open(p)
      try parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** The application watermark of the latest committed snapshot — a
    * restarting writer's resume point.
    */
  def lastWatermark(spark: SparkSession, root: String): Option[String] =
    snapshot(spark, root).flatMap(_.watermark)

  // ---- commit protocol -----------------------------------------------

  private val jvmLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Commit v = parent+1 via tmp + no-clobber rename; on CAS loss
    * (someone else committed v first) re-derive against the winner and
    * retry. `make` sees the parent snapshot (None on first commit) and
    * returns (op, full file list, added, removed, watermark).
    */
  private def commit(spark: SparkSession, root: String)
                    (make: Option[Snapshot] => (String, Vector[FileEntry], Vector[String], Vector[String], Option[String])): Snapshot = {
    val lock = jvmLocks.computeIfAbsent(new Path(root).toString, _ => new Object)
    lock.synchronized {
      val f = fs(spark, metaDir(root))
      f.mkdirs(metaDir(root))
      var attempts = 0
      while (attempts < 100) {
        attempts += 1
        val parent = snapshot(spark, root)
        val v = parent.map(_.id + 1).getOrElse(1L)
        val (op, files, added, removed, wm) = make(parent)
        val snap = Snapshot(v, op, files, added, removed, wm)
        val tmp = new Path(metaDir(root),
          f"snap-$v%08d.json.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
        val out = f.create(tmp, true)
        try out.write(render(snap).getBytes("UTF-8")) finally out.close()
        // the CAS: never clobber an existing snap-<v>.json (atomic on
        // HDFS rename semantics; same-JVM racers are serialized above)
        val won = !f.exists(snapPath(root, v)) && f.rename(tmp, snapPath(root, v))
        if (won) return snap
        f.delete(tmp, false) // lost: retry against the new parent
      }
      throw new IllegalStateException(
        s"commit contention on $root: gave up after 100 CAS attempts")
    }
  }

  /** Append `df` as new immutable data files. `statsCol`: record
    * per-file min/max of this column for manifest-side pruning (the
    * writer range-clusters on it so bounds are tight).
    */
  def append(spark: SparkSession, root: String, df: DataFrame,
             watermark: Option[String] = None,
             statsCol: Option[String] = None,
             clusterFiles: Int = 0): Snapshot = {
    val staged = stageFiles(spark, root, df, statsCol, clusterFiles)
    commit(spark, root) { parent =>
      ("append", parent.map(_.files).getOrElse(Vector.empty) ++ staged,
        staged.map(_.path), Vector.empty,
        watermark.orElse(parent.flatMap(_.watermark)))
    }
  }

  /** Atomically replace the whole table content. */
  def overwrite(spark: SparkSession, root: String, df: DataFrame,
                watermark: Option[String] = None,
                statsCol: Option[String] = None,
                clusterFiles: Int = 0): Snapshot = {
    val staged = stageFiles(spark, root, df, statsCol, clusterFiles)
    commit(spark, root) { parent =>
      ("overwrite", staged, staged.map(_.path),
        parent.map(_.files.map(_.path)).getOrElse(Vector.empty), watermark)
    }
  }

  /** Snapshot-isolated compaction/rewrite: atomically replace the
    * files selected by `pick` with `rewriteAs(their rows)` — e.g. fold
    * many small files into few sorted ones. Readers of the pre-rewrite
    * snapshot keep a consistent view throughout. If a concurrent
    * commit removed one of the picked files first, the rewrite aborts
    * cleanly (None, staged orphans deleted) instead of resurrecting
    * dropped data.
    */
  def rewrite(spark: SparkSession, root: String,
              pick: FileEntry => Boolean,
              rewriteAs: DataFrame => DataFrame,
              statsCol: Option[String] = None,
              clusterFiles: Int = 0): Option[Snapshot] = {
    val before = snapshot(spark, root).getOrElse(return None)
    val victims = before.files.filter(pick)
    if (victims.isEmpty) return None
    val rewritten = rewriteAs(spark.read.parquet(victims.map(_.path): _*))
    val staged = stageFiles(spark, root, rewritten, statsCol, clusterFiles)
    val victimSet = victims.map(_.path).toSet
    try {
      Some(commit(spark, root) { parent =>
        val p = parent.getOrElse(
          throw new IllegalStateException("table vanished under rewrite"))
        require(victimSet.subsetOf(p.files.map(_.path).toSet),
          "rewrite aborted: a concurrent commit removed a picked file")
        ("rewrite", p.files.filterNot(e => victimSet(e.path)) ++ staged,
          staged.map(_.path), victims.map(_.path), p.watermark)
      })
    } catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("rewrite aborted") =>
        val f = fs(spark, dataDir(root))
        staged.foreach(s => f.delete(new Path(s.path), false))
        None
    }
  }

  /** Read at the latest (or `asOf`) snapshot. `prune(lo, hi)`: called
    * for files with recorded bounds; return false to skip the file.
    * Files without bounds are always read (safe).
    */
  def read(spark: SparkSession, root: String, asOf: Option[Long] = None,
           prune: Option[(String, String) => Boolean] = None): DataFrame = {
    val snap = snapshot(spark, root, asOf).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot in $root"))
    val files = prune match {
      case Some(p) => snap.files.filter(f =>
        (f.lo, f.hi) match { case (Some(l), Some(h)) => p(l, h); case _ => true })
      case None => snap.files
    }
    if (files.isEmpty)
      throw new IllegalArgumentException(
        s"snapshot ${snap.id} of $root has no files after pruning")
    spark.read.parquet(files.map(_.path): _*)
  }

  /** Drop all but the newest `keepLast` manifests, then delete data
    * files no RETAINED snapshot references (safe orphan GC — a file
    * goes only when every retained manifest agrees it is dead).
    */
  def expire(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val ids = snapshotIds(spark, root)
    if (ids.length <= keepLast) return
    val (drop, keep) = ids.splitAt(ids.length - keepLast)
    val live: Set[String] = keep.flatMap(v =>
      snapshot(spark, root, Some(v)).get.files.map(_.path)).toSet
    val f = fs(spark, dataDir(root))
    drop.foreach { v =>
      snapshot(spark, root, Some(v)).get.files
        .filterNot(e => live(e.path))
        .foreach(e => f.delete(new Path(e.path), false))
      f.delete(snapPath(root, v), false)
    }
  }

  // ---- data file staging ---------------------------------------------

  /** Write `df` to uuid-named immutable files under `data/` and return
    * manifest entries. With `statsCol` the rows are range-clustered on
    * it first (tight per-file bounds); rows + bounds come from ONE
    * stats job over the staged files.
    */
  private def stageFiles(spark: SparkSession, root: String, df: DataFrame,
                         statsCol: Option[String],
                         clusterFiles: Int): Vector[FileEntry] = {
    val f = fs(spark, dataDir(root))
    f.mkdirs(dataDir(root))
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(root, s".stage-$stamp")
    // clusterFiles > 0 pins the output file count (an explicit
    // repartition width is a hard constraint AQE will not coalesce);
    // 0 lets Spark/AQE size the files
    val toWrite = statsCol match {
      case Some(c) if clusterFiles > 0 =>
        df.repartitionByRange(clusterFiles, col(c)).sortWithinPartitions(col(c))
      case Some(c) => df.repartitionByRange(col(c)).sortWithinPartitions(col(c))
      case None if clusterFiles > 0 => df.repartition(clusterFiles)
      case None => df
    }
    toWrite.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val staged = f.listStatus(stage).toVector
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val entries = staged.zipWithIndex.map { case (s, i) =>
      val dest = new Path(dataDir(root), f"$stamp-$i%05d.parquet")
      require(f.rename(s.getPath, dest), s"stage move failed: ${s.getPath}")
      FileEntry(dest.toString, -1L, s.getLen, None, None)
    }
    f.delete(stage, true)
    if (entries.isEmpty) return entries
    // one stats job: per-file row count (+ bounds when statsCol set)
    val base = spark.read.parquet(entries.map(_.path): _*)
      .groupBy(input_file_name().as("_f"))
    val stats = (statsCol match {
      case Some(c) => base.agg(count(lit(1)).as("_n"),
        min(col(c)).cast("string").as("_lo"), max(col(c)).cast("string").as("_hi"))
      case None => base.agg(count(lit(1)).as("_n"),
        lit(null).cast("string").as("_lo"), lit(null).cast("string").as("_hi"))
    }).collect().map(r => new Path(r.getString(0)).getName ->
      ((r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))).toMap
    entries.map { e =>
      stats.get(new Path(e.path).getName) match {
        case Some((n, lo, hi)) => e.copy(rows = n, lo = lo, hi = hi)
        case None => e.copy(rows = 0L) // empty parquet file: no groups
      }
    }
  }
}
