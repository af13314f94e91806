package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation pass a pre-training corpus goes through,
  * composed from this library's operators into ONE lazy plan — no
  * intermediate actions, so Catalyst sees the whole chain and a single
  * job runs it:
  *
  *   1. Unicode NFC normalization     (graft_normalize, narrow)
  *   2. global line-level dedup       (CCNet boilerplate pass, 2 shuffles)
  *   2b. exact-substring excision     (optional; Lee et al. stage 2 —
  *                                     variable-length dup spans cut out
  *                                     of the text, q48/q49 skew-safe shape)
  *   3. language ID on the survivors  (stopword vote or trigram, narrow)
  *   4. Gopher quality rules          (narrow)
  *   4b. decontamination              (optional; benchmark n-grams
  *                                     broadcast, GPT-3 appendix-C rule)
  *   5. exact-content dedup           (min-id ownership agg + join —
  *                                     the q48 skew-safe shape, 2 shuffles)
  *   6. deterministic id-hash sample  (narrow filter)
  *
  * [[curationReport]] returns every document with its curated text and
  * one keep flag PER STAGE (so corpus-loss accounting per filter is a
  * single aggregation over the report); [[curate]] is the
  * survivors-only projection. All decisions are pure functions of
  * content and id — byte-identical across retries, cluster sizes, and
  * resumes.
  */
object Curation {

  case class CurateConfig(
      normalize: Boolean = true,
      lineDedup: Boolean = true,
      lineMinLen: Int = 5,
      excise: Boolean = false, // stage 2b: variable-length substring excision
      exciseMinLen: Int = 50,  // Lee et al.'s published threshold (tokens)
      keepLangs: Set[String] = Set.empty, // empty = keep all languages
      langScorer: String = "stopwords", // or "trigram" (LangNgram profiles)
      gopher: Boolean = true,
      minWords: Long = 50,
      maxWords: Long = 100000,
      decontamNgram: Int = 8, // stage 4b n-gram order (bench df enables it)
      exactDedup: Boolean = true,
      sampleFraction: Double = 1.0) {
    require(Set("stopwords", "trigram")(langScorer),
      s"langScorer must be stopwords|trigram, got $langScorer")
    require(exciseMinLen >= 1 && decontamNgram >= 1)
  }

  /** `bench`: optional benchmark (test-set) table with `textCol`;
    * supplying it enables stage 4b (decontamination).
    */
  def curationReport(docs: DataFrame, idCol: String, textCol: String,
                     cfg: CurateConfig = CurateConfig(),
                     bench: Option[DataFrame] = None): DataFrame = {
    // 1. normalize — null text flows through as '' so every input doc is
    // counted by the funnel (and then filtered by word count), instead
    // of vanishing in the line-dedup posexplode
    val t0 = coalesce(col(textCol), lit(""))
    val normed = docs.select(col(idCol),
      (if (cfg.normalize) graft.expr.UnicodeNormalize(t0, "NFC")
       else t0).as("_t0"))

    // 2. line dedup -> curated text (kept lines rejoined in order)
    val lineDeduped =
      if (!cfg.lineDedup) normed.withColumn("text_curated", col("_t0"))
      else Dedup.markDupLines(normed, idCol, "_t0", cfg.lineMinLen)
        .groupBy(col(idCol))
        .agg(concat_ws("\n", expr(
          "transform(array_sort(collect_list(case when keep then struct(idx, line) end)), x -> x.line)"))
          .as("text_curated"))

    // 2b. optional variable-length exact-substring excision on the
    // curated text (Lee et al. stage 2; the q49 ownership shape —
    // tokens are whitespace-split, so excision flattens newlines into
    // the space-rejoined survivor text exactly as the operator defines)
    val curated =
      if (!cfg.excise) lineDeduped
      else lineDeduped
        .join(Dedup.exciseRebuild(lineDeduped, idCol, "text_curated",
          cfg.exciseMinLen), Seq(idCol))
        .drop("text_curated")
        .withColumnRenamed("text_excised", "text_curated")

    // 3. language ID — scorer is pluggable: the 7-stopword vote (cheap,
    // whole-word) or the Cavnar–Trenkle trigram profiles (codegen
    // kernel, robust on short/noisy text). Scorer-internal score
    // columns are dropped so the report schema is identical either way.
    val scored = cfg.langScorer match {
      case "trigram" =>
        LangNgram.langIdNgram(curated, "text_curated")
          .drop(LangNgram.Langs.map(l => s"s_$l"): _*)
      case _ =>
        TextAnalysis.langId(curated, "text_curated")
          .drop(TextAnalysis.Stopwords.keys.toSeq.map(l => s"hits_$l"): _*)
    }
    val withLang = scored.withColumn("keep_lang",
      if (cfg.keepLangs.isEmpty) lit(true)
      else col("pred_lang").isInCollection(cfg.keepLangs))

    // 4. Gopher rules appended narrow — no flags join back
    val withGopher =
      if (!cfg.gopher) withLang.withColumn("keep_gopher", lit(true))
      else TextAnalysis.withGopherFlags(withLang, "text_curated",
          cfg.minWords, cfg.maxWords)
        .withColumn("keep_gopher", col("keep") === 1L)
        .drop("keep", "flag_word_count", "flag_mean_word_len",
          "flag_symbol_ratio", "flag_stopwords")

    // 4b. optional decontamination: docs sharing any lowered token
    // n-gram with the benchmark table are flagged out. The bench side
    // broadcasts; the corpus side is the one narrow n-gram projection
    // (TextAnalysis.decontaminate), and the join back is keyed by id —
    // output volume O(contaminated docs)
    val withDecontam = bench match {
      case None => withGopher.withColumn("keep_decontam", lit(true))
      case Some(b) =>
        // the bench table's text rides under the DOCS' textCol name;
        // align it to the curated column for the shared n-gram helper
        val hits = TextAnalysis.decontaminate(
          withGopher.select(col(idCol), col("text_curated")),
          b.select(col(textCol).as("text_curated")),
          idCol, "text_curated", cfg.decontamNgram)
          .withColumnRenamed("n_hits", "_nh")
        withGopher.join(hits, Seq(idCol), "left")
          .withColumn("keep_decontam", col("_nh").isNull)
          .drop("_nh")
    }

    // 5. exact dedup on the CURATED text: min-id ownership aggregation
    // (map-side combinable; the hot all-identical key AQE-splits).
    // Sequential-stage semantics: ownership is computed over the
    // SURVIVORS of stages 3–4, so a duplicate group whose min-id copy
    // was rejected by language/Gopher still keeps its smallest
    // surviving copy (a corpus-wide owner could otherwise drop every
    // passing copy of a text). Non-survivors get keep_exact=false
    // (irrelevant to `keep`, which already requires stages 3–4).
    val withExact =
      if (!cfg.exactDedup) withDecontam.withColumn("keep_exact", lit(true))
      else {
        val owners = withDecontam
          .filter(col("keep_lang") && col("keep_gopher") && col("keep_decontam"))
          .select(col(idCol), md5(col("text_curated")).as("_h"))
          .groupBy("_h").agg(min(col(idCol)).as("_owner"))
        withDecontam.withColumn("_h", md5(col("text_curated")))
          .join(owners, Seq("_h"), "left")
          .withColumn("keep_exact",
            coalesce(col(idCol) === col("_owner"), lit(false)))
          .drop("_h", "_owner")
      }

    // 6. deterministic sample
    val sampled = withExact.withColumn("keep_sample",
      if (cfg.sampleFraction >= 1.0) lit(true)
      else md5(concat(lit("sample:"), col(idCol).cast("string")))
        < lit(TextAnalysis.hexThreshold(cfg.sampleFraction)))

    sampled.withColumn("keep",
      col("keep_lang") && col("keep_gopher") && col("keep_decontam") &&
        col("keep_exact") && col("keep_sample"))
  }

  /** Survivors only: (idCol, text_curated). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             cfg: CurateConfig = CurateConfig(),
             bench: Option[DataFrame] = None): DataFrame =
    curationReport(docs, idCol, textCol, cfg, bench)
      .filter(col("keep")).select(col(idCol), col("text_curated"))

  /** One-aggregation loss accounting over a report: docs surviving each
    * successive stage (the funnel every curation run reports).
    */
  def funnel(report: DataFrame): DataFrame =
    report.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("keep_lang"), 1L).otherwise(0L)).as("n_lang"),
      sum(when(col("keep_lang") && col("keep_gopher"), 1L).otherwise(0L))
        .as("n_gopher"),
      sum(when(col("keep_lang") && col("keep_gopher") && col("keep_decontam"),
        1L).otherwise(0L)).as("n_decontam"),
      sum(when(col("keep_lang") && col("keep_gopher") && col("keep_decontam") &&
        col("keep_exact"), 1L).otherwise(0L)).as("n_exact"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
}
