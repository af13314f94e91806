package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The COMPLETE curation funnel ([[graft.ops.Curation]]) as one
  * continuous streaming job: micro-batches of (doc_id, text) flow
  * through NFC -> global line dedup -> language ID -> Gopher -> exact
  * dedup -> deterministic sample, and the survivors land in
  * `outDir/curated/batch=N`.
  *
  * Why foreachBatch + parquet sidecars, not chained stateful
  * operators: the funnel needs up to THREE first-seen state domains
  * (line hashes, n-gram claims when cfg.excise is on, curated-text
  * hashes) keyed differently, and Structured
  * Streaming does not support two `flatMapGroupsWithState` operators
  * in one query. The deployable shape is the [[graft.Pipeline]]
  * `startBucketed` resume pattern: cross-batch claims live in
  * batch-partitioned parquet sidecars under the OUTPUT directory
  * (`_lines_seen/batch=N`, `_ngrams_seen/batch=N`,
  * `_texts_seen/batch=N`), each batch
  * anti-joins them and appends only its NEW claims. A replayed batch
  * (crash between sidecar write and commit) OVERWRITES its own
  * `batch=N` partitions — idempotent by construction, pinned by
  * StreamingSpec through a double-invoke and a checkpointed restart.
  *
  * Parity: over doc-ordered batches the kept set equals the batch
  * [[graft.ops.Curation.curate]] exactly — within a batch the in-batch
  * rule is literally the batch operator's, and across batches the
  * sidecar anti-join reproduces the global first-occurrence /
  * first-surviving-owner decisions (same argument as
  * [[StreamingLineDedup]], pinned).
  *
  * Scale: per batch the plan is the batch funnel's (narrow flags, one
  * line-hash shuffle, one ownership shuffle) plus two sidecar
  * anti-joins that read only hash columns; sidecar volume is the
  * distinct-hash stream, append-only, prunable by batch partition.
  * Without maintenance each batch would re-list and re-read EVERY
  * earlier batch's claim partitions — O(batches · corpus) over a run —
  * so [[compactSidecars]] periodically folds committed partitions into
  * a sorted base partition (`batch=-1`), keeping the per-batch read at
  * base + recent batches (the [[graft.Pipeline.compactCommits]]
  * pattern applied to all three claim domains). Wire it in with
  * `compactEvery` on [[start]]/[[processBatch]].
  */
object StreamingCuration {

  import graft.ops.Curation.CurateConfig

  /** (sidecar dir name, its hash column) for the three claim domains. */
  private val Sidecars =
    Seq("_lines_seen" -> "lh", "_ngrams_seen" -> "nh", "_texts_seen" -> "th")

  /** Fold the claim partitions of batches `0..upToBatch` into the base
    * partition `batch=-1` (as a NEW sorted chunk of files), then delete
    * the folded originals. `batch=-1` sorts below every real batch id,
    * so the read path's `batch < batchId` replay guard includes the
    * base unchanged.
    *
    * The fold NEVER reads or rewrites the existing base: every batch's
    * claims were anti-joined against ALL earlier claims (base included)
    * before being written, so partitions and base chunks are pairwise
    * DISJOINT by construction — folded batches simply become one more
    * disjoint chunk. Fold cost is therefore O(the K folded batches),
    * not O(corpus): amortized per batch it is O(1) in history length
    * (the LSM-append shape, not a full-base rewrite).
    *
    * Safety contract (mirrors [[graft.Pipeline.compactCommits]]):
    *  - ONLY COMMITTED batches may be folded: callers pass
    *    `upToBatch = currentBatchId - 1` — in Structured Streaming the
    *    engine has committed every batch below the one being processed,
    *    so no folded batch can ever replay. The in-flight batch's own
    *    partition is never touched, so ITS replay guard (own claims
    *    excluded via `batch < batchId`) is preserved. Rewinding the
    *    checkpoint behind a completed compaction is out of contract
    *    (exactly as for the doc-commit sidecar).
    *  - Crash-safe by superset: write the folded chunk to a temp dir,
    *    move it INTO `batch=-1`, and only then delete the snapshotted
    *    originals. After any prefix of those steps the sidecar holds a
    *    superset (possibly duplicated) of the folded claims — harmless,
    *    because every reader `.distinct()`s the claim set. A crash
    *    between move-in and partition delete can leave the interrupted
    *    fold's claims duplicated across two base chunks permanently
    *    (bounded by one fold's volume per crash; a set under distinct,
    *    so correctness is unaffected).
    *
    * At 10^12 docs this is the difference between a bounded read
    * (sorted base chunks + a handful of recent partitions) and an
    * unbounded O(batches) listing; run it every K batches
    * (`compactEvery`).
    */
  def compactSidecars(spark: SparkSession, outDir: String, upToBatch: Long,
                      targetBytesPerFile: Long = 64L * 1024 * 1024): Unit = {
    import org.apache.hadoop.fs.Path
    if (upToBatch < 0) return
    // sweep tmp dirs any EARLIER fold left behind by crashing between
    // its chunk write and its own cleanup — each later fold stamps a
    // fresh tmp, so without this the orphans accumulate forever
    {
      val out = new Path(outDir)
      val ofs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (ofs.exists(out))
        ofs.listStatus(out).foreach { s =>
          val n = s.getPath.getName
          if (s.isDirectory && Sidecars.exists { case (sc, _) =>
              n.startsWith(s".${sc}_compact_tmp-") })
            ofs.delete(s.getPath, true)
        }
    }
    for ((name, hashCol) <- Sidecars) {
      val root = new Path(s"$outDir/$name")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) {
        def isData(p: Path) = !p.getName.startsWith("_") && !p.getName.startsWith(".")
        val baseDir = new Path(root, "batch=-1")
        // snapshot exactly what this run reads, replaces, and deletes
        val foldDirs = fs.listStatus(root).filter { s =>
          s.isDirectory && s.getPath.getName.startsWith("batch=") && {
            val b = s.getPath.getName.stripPrefix("batch=").toLong
            b >= 0 && b <= upToBatch
          }
        }.map(_.getPath)
        val foldFiles = foldDirs.flatMap(d =>
          fs.listStatus(d).filter(f => f.isFile && isData(f.getPath)))
        if (foldFiles.isEmpty) // nothing to fold; drop any empty partitions
          foldDirs.foreach(d => fs.delete(d, true))
        else {
          val bytes = foldFiles.map(_.getLen).sum
          val nOut = math.max(1L, bytes / targetBytesPerFile).toInt
          // ONLY the folded partitions — never the base (disjoint by the
          // write-path anti-join; the distinct covers crash-window
          // duplicates among the folded partitions themselves)
          val claims = spark.read.parquet(
            foldFiles.map(_.getPath.toString).toIndexedSeq: _*)
            .select(hashCol).distinct()
          val stamp = java.util.UUID.randomUUID().toString.take(8)
          val tmp = new Path(s"$outDir/.${name}_compact_tmp-$stamp")
          fs.delete(tmp, true)
          claims.repartitionByRange(nOut, col(hashCol)).sortWithinPartitions(hashCol)
            .write.mode("overwrite").parquet(tmp.toString)
          fs.mkdirs(baseDir)
          fs.listStatus(tmp).filter(f => f.isFile && isData(f.getPath))
            .zipWithIndex.foreach { case (f, i) =>
              require(fs.rename(f.getPath, new Path(baseDir, s"compact-$stamp-$i.parquet")),
                s"compactSidecars: cannot move in ${f.getPath}")
            }
          // delete ONLY the snapshotted originals (move-in completed)
          foldDirs.foreach(d => fs.delete(d, true))
          fs.delete(tmp, true)
        }
      }
    }
  }

  /** One micro-batch through the funnel with sidecar state under
    * `outDir`. Exposed (not private) so the idempotency property is
    * directly testable.
    */
  def processBatch(batch: DataFrame, batchId: Long, outDir: String,
                   idCol: String, textCol: String,
                   cfg: CurateConfig,
                   bench: Option[DataFrame] = None,
                   compactEvery: Int = 0,
                   benchNg: Option[DataFrame] = None): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    // Each sidecar write plus the final curated write is its own action;
    // pin the frames shared between them so the heavy shuffles (line
    // dedup, n-gram excision, decontam join) execute once per batch, not
    // once per action (RunCurate's localCheckpoint pattern, with an
    // explicit unpersist so a long-running stream holds no cache across
    // batches).
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def pin(df: DataFrame): DataFrame = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pinned += p
      p
    }
    try {
      processBatchImpl(batch, batchId, outDir, idCol, textCol, cfg, bench,
        benchNg, pin)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        compactSidecars(spark, outDir, batchId - 1) // only committed batches
    } finally pinned.foreach(_.unpersist(false))
  }

  private def processBatchImpl(batch: DataFrame, batchId: Long, outDir: String,
                               idCol: String, textCol: String,
                               cfg: CurateConfig,
                               bench: Option[DataFrame],
                               benchNg: Option[DataFrame],
                               pin: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._

    def sidecar(name: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a batch with ZERO new claims leaves the directory with only a
      // _SUCCESS marker (dynamic partition overwrite writes no partition
      // dirs) — schema inference would throw; require an actual data file
      // mirror Hadoop's hidden-file convention ('.' AND '_' prefixes):
      // a crashed write's _temporary attempt files must not count —
      // spark.read would ignore them and still fail schema inference
      def visible(n: String) = !n.startsWith(".") && !n.startsWith("_")
      def hasParquet(d: org.apache.hadoop.fs.Path): Boolean =
        fs.exists(d) && fs.listStatus(d).exists { s =>
          (s.isFile && visible(s.getPath.getName) &&
            s.getPath.getName.endsWith(".parquet")) ||
            (s.isDirectory && visible(s.getPath.getName) && hasParquet(s.getPath))
        }
      if (hasParquet(p)) Some(spark.read.parquet(p.toString)) else None
    }
    // replay guard half 1: a partitioned overwrite replaces this
    // batch's own earlier partial writes and nothing else
    def writePart(df: DataFrame, name: String): Unit =
      df.withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(s"$outDir/$name")
    // replay guard half 2: claims made by THIS batch id in a previous
    // (crashed) attempt must not suppress its own rows
    def earlier(df: DataFrame): DataFrame = df.filter(col("batch") < batchId)

    // stages 1-2: NFC + line dedup (in-batch batch rule + cross-batch
    // line-hash anti-join; short lines bypass exactly as in batch)
    val t0 = coalesce(col(textCol), lit(""))
    val normed = batch.select(col(idCol),
      (if (cfg.normalize) graft.expr.UnicodeNormalize(t0, "NFC") else t0)
        .as("_t0"))
    val curated =
      if (!cfg.lineDedup) normed.withColumn("text_curated", col("_t0"))
      else {
        // markDupLines already carries `elig`; keep = in-batch keep
        // AND (ineligible OR line hash not claimed by an earlier batch)
        val marked = graft.ops.Dedup
          .markDupLines(normed, idCol, "_t0", cfg.lineMinLen)
          .withColumn("_lh", md5(col("line")))
        val seenSet = sidecar("_lines_seen")
          .map(s => earlier(s).select(col("lh")).distinct())
        // NO broadcast hint on the seen side: it grows with the corpus
        // (AQE picks the strategy; at 10^12 docs this is a shuffled
        // left join keyed by the 16-byte hash)
        val keepDf = pin(seenSet match {
          case Some(s) => marked.join(s.withColumnRenamed("lh", "_lh")
              .withColumn("_seen", lit(true)), Seq("_lh"), "left")
            .withColumn("keep",
              col("keep") && !(col("elig") && coalesce(col("_seen"), lit(false))))
            .drop("_seen")
          case None => marked
        })
        // record this batch's newly-claimed eligible line hashes
        val newClaims = keepDf.filter(col("elig")).select(col("_lh").as("lh")).distinct()
        val toWrite = seenSet match {
          case Some(s) => newClaims.join(s, newClaims("lh") === s("lh"), "left_anti")
          case None => newClaims
        }
        writePart(toWrite, "_lines_seen")
        keepDf.groupBy(col(idCol))
          .agg(concat_ws("\n", expr(
            "transform(array_sort(collect_list(case when keep then struct(idx, line) end)), x -> x.line)"))
            .as("text_curated"))
      }

    // stage 2b (optional): variable-length excision with cross-batch
    // n-gram claims in a third sidecar (_ngrams_seen, md5 of the
    // n-gram). Coverage = in-batch non-first occurrences (the batch
    // operator's rule) UNION occurrences of n-grams claimed by earlier
    // batches; over doc-ordered batches the union reproduces the batch
    // exciseRebuild exactly (same first-global-occurrence argument).
    val excised =
      if (!cfg.excise) curated
      else {
        val n = cfg.exciseMinLen
        val curatedP = pin(curated) // the line groupBy feeds occ AND the rebuild
        val toks = curatedP.select(col(idCol),
          split(col("text_curated"), "\\s+").as("_ts"))
        val occ = graft.ops.Dedup.ngramOccurrences(toks, idCol, n)
          .withColumn("_nh", md5(col("ng")))
        val first = occ.groupBy("ng")
          .agg(min(struct(col(idCol), col("i"))).as("_f"))
        val dupIn = occ.join(first, "ng")
          .filter(!(col(idCol) === col(s"_f.$idCol") && col("i") === col("_f.i")))
          .select(col(idCol), col("i"))
        val seenNg = sidecar("_ngrams_seen")
          .map(s => earlier(s).select(col("nh")).distinct())
        val dupSeen = seenNg match {
          case Some(s) => occ.join(s.withColumnRenamed("nh", "_nh"), Seq("_nh"))
            .select(col(idCol), col("i"))
          case None => dupIn.limit(0)
        }
        // `first` (the ownership groupBy) already materializes exactly
        // the distinct n-gram set — hashing its key avoids a SECOND
        // full shuffle of every occurrence for the claims write
        val newNg = first.select(md5(col("ng")).as("nh"))
        val toWriteNg = seenNg match {
          case Some(s) => newNg.join(s, newNg("nh") === s("nh"), "left_anti")
          case None => newNg
        }
        writePart(toWriteNg, "_ngrams_seen")
        val spans = graft.ops.Dedup.mergeSpans(
          dupIn.union(dupSeen.select(col(idCol), col("i"))), idCol, n)
        toks.join(spans, Seq(idCol), "left")
          .select(col(idCol), concat_ws(" ", expr(
            """transform(
              |  filter(transform(_ts, (t, j) -> struct(j, t)),
              |         s -> spans is null or
              |              not exists(spans, sp -> s.j >= sp.st and s.j < sp.en)),
              |  x -> x.t)""".stripMargin)).as("text_curated"))
      }

    // stages 3-4: language + Gopher (narrow, identical to batch)
    val scored = cfg.langScorer match {
      case "trigram" => graft.ops.LangNgram.langIdNgram(excised, "text_curated")
        .drop(graft.ops.LangNgram.Langs.map(l => s"s_$l"): _*)
      case _ => graft.ops.TextAnalysis.langId(excised, "text_curated")
        .drop(graft.ops.TextAnalysis.Stopwords.keys.toSeq.map(l => s"hits_$l"): _*)
    }
    val withLang = scored.withColumn("keep_lang",
      if (cfg.keepLangs.isEmpty) lit(true)
      else col("pred_lang").isInCollection(cfg.keepLangs))
    val withGopher =
      if (!cfg.gopher) withLang.withColumn("keep_gopher", lit(true))
      else graft.ops.TextAnalysis.withGopherFlags(withLang, "text_curated",
          cfg.minWords, cfg.maxWords)
        .withColumn("keep_gopher", col("keep") === 1L)
        .drop("keep", "flag_word_count", "flag_mean_word_len",
          "flag_symbol_ratio", "flag_stopwords")

    // stage 4b (optional): decontamination is STATELESS (the bench
    // n-gram set is static and broadcasts) — per-batch application IS
    // the batch rule, no sidecar needed
    // the bench n-gram set is STATIC across the stream: use the
    // precomputed (persisted) set when the caller supplies one instead
    // of re-deriving it every micro-batch
    val ngSet: Option[DataFrame] = benchNg.orElse(bench.map(b =>
      graft.ops.TextAnalysis.benchNgramSet(
        b.select(col(textCol).as("text_curated")), "text_curated",
        cfg.decontamNgram)))
    val withDecontam = pin(ngSet match {
      case None => withGopher.withColumn("keep_decontam", lit(true))
      case Some(ngs) =>
        val hits = graft.ops.TextAnalysis.decontaminateNg(
          withGopher.select(col(idCol), col("text_curated")),
          ngs, idCol, "text_curated", cfg.decontamNgram)
          .withColumnRenamed("n_hits", "_nh")
        withGopher.join(hits, Seq(idCol), "left")
          .withColumn("keep_decontam", col("_nh").isNull)
          .drop("_nh")
    })

    // stage 5: exact dedup — in-batch ownership over survivors +
    // cross-batch anti-join on earlier batches' surviving hashes
    val withExact =
      if (!cfg.exactDedup) withDecontam.withColumn("keep_exact", lit(true))
      else {
        val survivors = withDecontam
          .filter(col("keep_lang") && col("keep_gopher") && col("keep_decontam"))
          .withColumn("_h", md5(col("text_curated")))
        val owners = survivors.groupBy("_h").agg(min(col(idCol)).as("_owner"))
        val seen = sidecar("_texts_seen")
          .map(s => earlier(s).select(col("th")).distinct())
        // seen side unbroadcast for the same corpus-growth reason
        val ownersUnseen = seen match {
          case Some(s) => owners.join(s.withColumnRenamed("th", "_h")
              .withColumn("_seen", lit(true)), Seq("_h"), "left")
            .withColumn("_owner",
              when(coalesce(col("_seen"), lit(false)), lit(null)).otherwise(col("_owner")))
            .drop("_seen")
          case None => owners
        }
        val newHashes = survivors.select(col("_h").as("th")).distinct()
        val toWrite = seen match {
          case Some(s) => newHashes.join(s, newHashes("th") === s("th"), "left_anti")
          case None => newHashes
        }
        writePart(toWrite, "_texts_seen")
        withDecontam.withColumn("_h", md5(col("text_curated")))
          .join(ownersUnseen, Seq("_h"), "left")
          .withColumn("keep_exact",
            coalesce(col(idCol) === col("_owner"), lit(false)))
          .drop("_h", "_owner")
      }

    // stage 6 + commit: deterministic sample, then the batch's
    // survivors overwrite their own partition
    val kept = withExact.withColumn("keep_sample",
        if (cfg.sampleFraction >= 1.0) lit(true)
        else md5(concat(lit("sample:"), col(idCol).cast("string")))
          < lit(graft.ops.TextAnalysis.hexThreshold(cfg.sampleFraction)))
      .filter(col("keep_lang") && col("keep_gopher") && col("keep_decontam") &&
        col("keep_exact") && col("keep_sample"))
      .select(col(idCol), col("text_curated"))
    writePart(kept, "curated")
  }

  /** Start the continuous funnel over a parquet docs directory.
    * AvailableNow by default (bounded backfill); pass a processing-time
    * trigger for an infinite stream.
    */
  def start(spark: SparkSession, docsDir: String, outDir: String,
            idCol: String = "doc_id", textCol: String = "text",
            cfg: CurateConfig = CurateConfig(),
            bench: Option[DataFrame] = None,
            trigger: Trigger = Trigger.AvailableNow(),
            compactEvery: Int = 0,
            maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val schema = spark.read.parquet(docsDir).schema
    // static bench -> its n-gram set is computed and persisted ONCE for
    // the stream's lifetime instead of per micro-batch
    val benchNg = bench.map(b => graft.ops.TextAnalysis.benchNgramSet(
      b.select(col(textCol).as("text_curated")), "text_curated",
      cfg.decontamNgram).persist())
    val reader = spark.readStream.schema(schema)
    // pacing: without it AvailableNow takes the whole backlog as ONE
    // micro-batch — fine for parity, but periodic compaction and bounded
    // per-batch memory need the backfill chunked
    val paced = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString) else reader
    paced.parquet(docsDir)
      .writeStream
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, outDir, idCol, textCol, cfg, bench, compactEvery,
          benchNg)
      }
      .start()
  }
}
