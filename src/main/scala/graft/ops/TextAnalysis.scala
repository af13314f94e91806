package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All narrow
  * (per-row) transforms — they run at scan speed on 100 TB.
  */
object TextAnalysis {

  val TokenSplitSql = "\\\\s+"
  val BpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  val PunctRe = "[^A-Za-z0-9\\s]"

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "este", "una"))

  private def hitsOn(toksCol: String, ws: Seq[String]): Column = {
    val list = ws.map(w => s"'$w'").mkString("(", ",", ")")
    expr(s"size(filter($toksCol, w -> w IN $list))")
  }

  /** n-gram-heuristic language ID: stopword vote, first-wins priority.
    * The lowered token array is bound once in its own projection (a
    * non-cheap alias referenced once per language survives
    * CollapseProject), so the regex split runs once per row, not once
    * per language.
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val langs = Stopwords.keys.toVector.sorted // de, en, es, fr
    val toksed = df.withColumn("_toks", split(lower(col(textCol)), "\\s+"))
    val withHits = langs.foldLeft(toksed) { (d, l) =>
      d.withColumn(s"hits_$l", hitsOn("_toks", Stopwords(l)))
    }
    val best = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"hits_$l") === greatest(langs.map(x => col(s"hits_$x")): _*) &&
        col(s"hits_$l") > 0, l).otherwise(acc)
    }
    withHits.withColumn("pred_lang", best).drop("_toks")
  }

  /** Quality features: length / punctuation / stopword ratios. Token
    * array bound once (see [[langId]]).
    */
  def quality(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_toks", split(col(textCol), "\\s+"))
      .withColumn("n_tokens", size(col("_toks")))
      .withColumn("n_punct", regexp_count(col(textCol), lit(PunctRe)))
      .withColumn("n_stop", expr(
        s"size(filter(_toks, w -> lower(w) IN ${Stopwords("en").map(w => s"'$w'").mkString("(", ",", ")")}))"))
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens"))
      .withColumn("punct_ratio", col("n_punct") / greatest(length(col(textCol)), lit(1)))
      .withColumn("avg_word_len",
        expr("aggregate(_toks, 0L, (a, w) -> a + length(w))") / col("n_tokens"))
      .drop("_toks")

  /** Token counting: whitespace + a BPE-ish regex segmentation. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(split(col(textCol), "\\s+")))
      .withColumn("bpe_tokens", regexp_count(col(textCol), lit(BpeRe)))

  /** Rolling-shingle content fingerprint (min-hash of 5-gram shingles). */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp",
      array_min(transform(Dedup.shingles(textCol, 5), x => md5(x))))

  /** Repetition signals (the Gopher / RefinedWeb "repetitive content"
    * family, adapted to flat text): duplicate-token ratio (narrow) and
    * the fraction of all word-bigram occurrences taken by the single
    * most frequent bigram — boilerplate and spam pages spike on both.
    *
    * Scale shape: the token stats are narrow; the top-bigram count is
    * ONE shuffle keyed by (doc, bigram) with map-side partial counts —
    * never all-pairs, never corpus-global. Ratios are emitted as
    * integer micro-units (exact cross-engine arithmetic).
    *
    * Output: idCol, n_tokens, dup_token_ratio_u, top_bigram_n,
    * top_bigram_frac_u.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .withColumn("_toks", split(col(textCol), "\\s+"))
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("_toks"))).cast("long").as("_nd"),
        col("_toks"))
    val bigrams = base.select(col(idCol), explode(expr(
      """case when size(_toks) >= 2
        |  then transform(sequence(1, size(_toks) - 1),
        |         i -> concat(try_element_at(_toks, i), ' ',
        |                     try_element_at(_toks, i + 1)))
        |  else array() end""".stripMargin)).as("_bg"))
    val top = bigrams.groupBy(col(idCol), col("_bg")).count()
      .groupBy(col(idCol)).agg(max("count").as("top_bigram_n"))
    base.join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        expr("cast(round(1000000.0 * (n_tokens - _nd) / greatest(n_tokens, 1)) as bigint)")
          .as("dup_token_ratio_u"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        expr("cast(round(1000000.0 * coalesce(top_bigram_n, 0) / greatest(n_tokens - 1, 1)) as bigint)")
          .as("top_bigram_frac_u"))
  }

  /** The Gopher quality-filter rules (Rae et al. 2021, §A1.1 — the
    * public rule set every LLM curation pipeline reimplements), with
    * every threshold comparison done in INTEGER cross-multiplied form
    * so the flags are bit-reproducible across engines:
    *  - word count in [minWords, maxWords]
    *  - mean word length in [3, 10]  (sum_len vs 3n / 10n)
    *  - symbol-to-word ratio < 0.1   (10 * n_punct < n_tokens)
    *  - >= 2 distinct words from the 8-stopword indicator list
    * Narrow — zero shuffle; `keep` is the conjunction.
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** PII scrubbing: email / URL detection counts + redaction to
    * placeholder tokens — the pre-training privacy pass. Narrow, pure
    * regexp (codegen'd built-ins); patterns chosen to behave
    * identically under Java regex (Spark) and RE2 (DuckDB oracle).
    * Emails are replaced before URLs so the two passes cannot overlap.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  /** Deterministic corpus sampling: keep a document iff a hash of its
    * id falls under the fraction threshold. Unlike `df.sample()` (rand
    * per task — different rows per retry/cluster size), this is a pure
    * function of the id: stable across resumes, retries, engines — the
    * only sampling a resumable 100 TB pipeline can afford. Two forms:
    * md5-hex-prefix (cross-engine, the oracle form — lexicographic
    * comparison of lowercase hex IS the uniform numeric comparison) and
    * xxhash64 (the narrow fast path; same statistics).
    */
  def sampleDeterministic(df: DataFrame, idCol: String,
                          fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction")
    df.filter(md5(concat(lit("sample:"), col(idCol).cast("string")))
      < lit(hexThreshold(fraction)))
  }

  def sampleDeterministicFast(df: DataFrame, idCol: String,
                              fraction: Double): DataFrame =
    df.filter(pmod(xxhash64(lit("sample"), col(idCol)), lit(1000000L))
      < lit((fraction * 1e6).toLong))

  /** 8-hex-digit threshold: fraction of the 32-bit prefix space. */
  def hexThreshold(fraction: Double): String =
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"

  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(UrlRe)).cast("long").as("n_urls"),
      md5(regexp_replace(
        regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        UrlRe, "<URL>")).as("redacted_md5"))

  def gopherFlags(df: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50, maxWords: Long = 100000): DataFrame = {
    val stops = GopherStops.map(w => s"'$w'").mkString("array(", ",", ")")
    df.withColumn("_toks", split(col(textCol), "\\s+"))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("_sumlen",
        expr("aggregate(_toks, 0L, (a, w) -> a + length(w))"))
      .withColumn("_npunct", regexp_count(col(textCol), lit(PunctRe)).cast("long"))
      .withColumn("_nstops", expr(
        s"size(array_intersect(array_distinct(transform(_toks, w -> lower(w))), $stops))"))
      .select(col(idCol), col("n_tokens"),
        when(col("n_tokens").between(minWords, maxWords), 1L).otherwise(0L)
          .as("flag_word_count"),
        when(col("_sumlen") >= lit(3) * col("n_tokens") &&
             col("_sumlen") <= lit(10) * col("n_tokens"), 1L).otherwise(0L)
          .as("flag_mean_word_len"),
        when(lit(10) * col("_npunct") < col("n_tokens"), 1L).otherwise(0L)
          .as("flag_symbol_ratio"),
        when(col("_nstops") >= 2, 1L).otherwise(0L).as("flag_stopwords"))
      .withColumn("keep",
        (col("flag_word_count") * col("flag_mean_word_len") *
          col("flag_symbol_ratio") * col("flag_stopwords")).cast("bigint"))
  }
}
