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
  */
object StreamingCuration {

  import graft.ops.Curation.CurateConfig

  /** One micro-batch through the funnel with sidecar state under
    * `outDir`. Exposed (not private) so the idempotency property is
    * directly testable.
    */
  def processBatch(batch: DataFrame, batchId: Long, outDir: String,
                   idCol: String, textCol: String,
                   cfg: CurateConfig,
                   bench: Option[DataFrame] = None): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return

    def sidecar(name: String): Option[DataFrame] = {
      val path = s"$outDir/$name"
      if (new org.apache.hadoop.fs.Path(path).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          .exists(new org.apache.hadoop.fs.Path(path)))
        Some(spark.read.parquet(path))
      else None
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
        val keepDf = seenSet match {
          case Some(s) => marked.join(s.withColumnRenamed("lh", "_lh")
              .withColumn("_seen", lit(true)), Seq("_lh"), "left")
            .withColumn("keep",
              col("keep") && !(col("elig") && coalesce(col("_seen"), lit(false))))
            .drop("_seen")
          case None => marked
        }
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
        val toks = curated.select(col(idCol),
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
        val newNg = occ.select(col("_nh").as("nh")).distinct()
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
    val withDecontam = bench match {
      case None => withGopher.withColumn("keep_decontam", lit(true))
      case Some(b) =>
        val hits = graft.ops.TextAnalysis.decontaminate(
          withGopher.select(col(idCol), col("text_curated")),
          b.select(col(textCol).as("text_curated")),
          idCol, "text_curated", cfg.decontamNgram)
          .withColumnRenamed("n_hits", "_nh")
        withGopher.join(hits, Seq(idCol), "left")
          .withColumn("keep_decontam", col("_nh").isNull)
          .drop("_nh")
    }

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
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = spark.read.parquet(docsDir).schema
    spark.readStream.schema(schema).parquet(docsDir)
      .writeStream
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, outDir, idCol, textCol, cfg, bench)
      }
      .start()
  }
}
