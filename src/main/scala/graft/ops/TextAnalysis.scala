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
}
