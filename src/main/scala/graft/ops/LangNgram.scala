package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification (Cavnar–Trenkle shape):
  * each language's profile is its rank-weighted top character trigrams,
  * built DETERMINISTICALLY at object init from a vendored
  * high-frequency word list (no external data, identical across
  * engines/JVMs); a document's score per language is the sum of
  * profile weights over its padded-lowercase trigrams.
  *
  * This replaces the 7-stopword vote as the lifted model: trigrams
  * catch morphology (suffixes, digraphs) and word fragments, so short
  * or noisy documents that contain no whole stopword still classify.
  *
  * Scale shape: the scorer is ONE narrow pass — the trigram array is
  * bound once per row and a single `aggregate` HOF accumulates all four
  * language scores against constant-folded map literals. No shuffle,
  * no join; runs at scan speed on 100 TB. The equivalent
  * explode+broadcast-join formulation ([[scoresByJoin]]) is kept as the
  * cross-engine parity/equality reference (pinned by OpsSpec; it is
  * also the shape the DuckDB oracle mirrors).
  */
object LangNgram {

  /** Vendored per-language high-frequency words (function words +
    * top lexical items). The profile derives from these only.
    */
  val SeedWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "be", "to", "of", "and", "a", "in", "that", "have",
      "it", "for", "not", "on", "with", "he", "as", "you", "do", "at",
      "this", "but", "his", "by", "from", "they", "we", "say", "her",
      "she", "or", "an", "will", "my", "one", "all", "would", "there",
      "their", "what", "so", "up", "out", "if", "about", "who", "get",
      "which", "go", "me", "when"),
    "de" -> Seq("der", "die", "das", "und", "sein", "in", "ein", "zu",
      "haben", "ich", "werden", "sie", "von", "nicht", "mit", "es",
      "sich", "auch", "auf", "für", "an", "er", "so", "dass", "können",
      "dieser", "als", "ihr", "ja", "wie", "bei", "oder", "wir", "aber",
      "dann", "man", "da", "noch", "nach", "was", "also", "aus", "all",
      "wenn", "nur", "mal", "über", "schon", "gut", "zum"),
    "fr" -> Seq("le", "de", "un", "être", "et", "à", "il", "avoir", "ne",
      "je", "son", "que", "se", "qui", "ce", "dans", "en", "du", "elle",
      "au", "pour", "pas", "vous", "par", "sur", "faire", "plus", "dire",
      "me", "on", "mon", "lui", "nous", "comme", "mais", "ou", "si",
      "leur", "y", "dont", "tout", "avec", "petit", "deux", "même",
      "aussi", "bien", "où", "sans", "peut"),
    "es" -> Seq("el", "la", "de", "que", "y", "a", "en", "un", "ser",
      "se", "no", "haber", "por", "con", "su", "para", "como", "estar",
      "tener", "le", "lo", "todo", "pero", "más", "hacer", "o", "poder",
      "decir", "este", "ir", "otro", "ese", "si", "me", "ya", "ver",
      "porque", "dar", "cuando", "muy", "sin", "vez", "mucho", "saber",
      "qué", "sobre", "mi", "alguno", "mismo", "también"))

  /** Languages in deterministic tie-priority order (same as the
    * stopword model: en > de > fr > es).
    */
  val Langs: Vector[String] = Vector("en", "de", "fr", "es")

  val TopN = 48

  /** lang -> (trigram, weight) with weight = TopN - rank; rank by
    * (count desc, gram asc) over the space-padded seed words.
    */
  val Profiles: Map[String, Seq[(String, Int)]] = SeedWords.map {
    case (l, ws) =>
      val counts = scala.collection.mutable.Map.empty[String, Int]
      for {
        w <- ws
        padded = " " + w.toLowerCase + " "
        i <- 0 to padded.length - 3
      } {
        val g = padded.substring(i, i + 3)
        counts(g) = counts.getOrElse(g, 0) + 1
      }
      val top = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(TopN)
      l -> top.zipWithIndex.map { case ((g, _), r) => (g, TopN - r) }
  }

  private def esc(s: String) = s.replace("'", "\\'")

  private def mapLit(l: String): String =
    Profiles(l).map { case (g, w) => s"'${esc(g)}', $w" }
      .mkString("map(", ", ", ")")

  /** Padded-lowercase trigram array, bound once per row. The window
    * count uses the LOWERED length (lowercasing can change codepoint
    * count, e.g. U+0130), keeping this bit-equal to the codegen kernel.
    */
  def trigramsExpr(textCol: String): Column = expr(
    s"""transform(sequence(1, greatest(length(lower($textCol)), 1)),
       |  i -> substring(concat(' ', lower($textCol), ' '), i, 3))""".stripMargin)

  /** All four language scores in ONE aggregate pass over the trigram
    * array column (names s_en..s_es, BIGINT).
    */
  def scoresExpr(trisCol: String): Column = {
    val zero = Langs.map(l => s"'$l', 0L").mkString(", ")
    val steps = Langs.map(l =>
      s"'$l', a.$l + coalesce(element_at(${mapLit(l)}, g), 0)").mkString(",\n      ")
    expr(
      s"""aggregate($trisCol, named_struct($zero),
         |  (a, g) -> named_struct(
         |      $steps))""".stripMargin)
  }

  /** Deterministic argmax with the en > de > fr > es priority;
    * 'und' when every score is zero.
    */
  def predFromScores: Column = {
    val all = Langs.map(l => col(s"s_$l"))
    Langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"s_$l") === greatest(all: _*) && col(s"s_$l") > 0, l)
        .otherwise(acc)
    }
  }

  /** Narrow scorer: df + (s_en, s_de, s_fr, s_es, pred_lang). Uses the
    * codegen kernel ([[graft.expr.LangScoresOf]]: one binary-search
    * lookup per 3-char window, zero allocation); pinned bit-equal to
    * [[langIdNgramHof]] and [[scoresByJoin]] by OpsSpec.
    */
  def langIdNgram(df: DataFrame, textCol: String): DataFrame = {
    val scored = df.withColumn("_sc", graft.expr.LangScoresOf(col(textCol)))
    Langs.zipWithIndex.foldLeft(scored) { case (d, (l, i)) =>
        d.withColumn(s"s_$l", col("_sc").getItem(i))
      }
      .withColumn("pred_lang", predFromScores)
      .drop("_sc")
  }

  /** The pure-Catalyst HOF formulation (trigram array bound once, one
    * aggregate lambda) — the equality reference for the codegen kernel.
    */
  def langIdNgramHof(df: DataFrame, textCol: String): DataFrame = {
    val scored = df
      .withColumn("_tris", trigramsExpr(textCol))
      .withColumn("_sc", scoresExpr("_tris"))
    Langs.foldLeft(scored) { (d, l) =>
        d.withColumn(s"s_$l", col(s"_sc.$l"))
      }
      .withColumn("pred_lang", predFromScores)
      .drop("_tris", "_sc")
  }

  /** Equality/parity reference: explode trigrams, broadcast-join the
    * profile table, one groupBy. The shape the DuckDB oracle mirrors.
    */
  def scoresByJoin(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prof = Langs.flatMap(l => Profiles(l).map { case (g, w) => (l, g, w) })
      .toDF("lang", "gram", "w")
    val tris = df.select(col(idCol), explode(trigramsExpr(textCol)).as("gram"))
    val aggs = Langs.map(l =>
      coalesce(sum(when(col("lang") === l, col("w"))), lit(0)).cast("long").as(s"s_$l"))
    val joined = tris.join(broadcast(prof), Seq("gram"), "left")
      .groupBy(idCol).agg(aggs.head, aggs.tail: _*)
    df.select(col(idCol)).join(joined, Seq(idCol), "left")
      .select(col(idCol) +: Langs.map(l => coalesce(col(s"s_$l"), lit(0L)).as(s"s_$l")): _*)
      .withColumn("pred_lang", predFromScores)
  }
}
