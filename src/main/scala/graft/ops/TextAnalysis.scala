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

  private def hitCount(textCol: String, ws: Seq[String]): Column = {
    val list = ws.map(w => s"'$w'").mkString("(", ",", ")")
    expr(s"size(filter(split(lower($textCol), '$TokenSplitSql'), w -> w IN $list))")
  }

  /** n-gram-heuristic language ID: stopword vote, first-wins priority. */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val langs = Stopwords.keys.toVector.sorted // de, en, es, fr
    val withHits = langs.foldLeft(df) { (d, l) =>
      d.withColumn(s"hits_$l", hitCount(textCol, Stopwords(l)))
    }
    val best = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"hits_$l") === greatest(langs.map(x => col(s"hits_$x")): _*) &&
        col(s"hits_$l") > 0, l).otherwise(acc)
    }
    withHits.withColumn("pred_lang", best)
  }

  /** Quality features: length / punctuation / stopword ratios. */
  def quality(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", size(split(col(textCol), "\\s+")))
      .withColumn("n_punct", regexp_count(col(textCol), lit(PunctRe)))
      .withColumn("n_stop", hitCount(textCol, Stopwords("en")))
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens"))
      .withColumn("punct_ratio", col("n_punct") / greatest(length(col(textCol)), lit(1)))
      .withColumn("avg_word_len",
        expr(s"aggregate(split($textCol, '$TokenSplitSql'), 0L, (a, w) -> a + length(w))") /
          col("n_tokens"))

  /** Token counting: whitespace + a BPE-ish regex segmentation. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(split(col(textCol), "\\s+")))
      .withColumn("bpe_tokens", regexp_count(col(textCol), lit(BpeRe)))

  /** Rolling-shingle content fingerprint (min-hash of 5-gram shingles). */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp",
      array_min(transform(Dedup.shingles(textCol, 5), x => md5(x))))
}
