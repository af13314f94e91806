package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-combinator forms of the reference's scalar functions
  * (SURVEY.md §2.8) — pure `org.apache.spark.sql.functions` compositions
  * (whole-stage-codegen'd), no UDFs; the only custom Expression is
  * [[PyTitleCase]].
  *
  * The *bit-exact* per-document semantics (full dateutil battery,
  * literal_eval emulation) live in graft.text / graft.annotate and run
  * inside the narrow per-doc pipeline; these Column forms cover the
  * SQL-expressible core used by the query surface.
  */
object Exprs {

  /** F1 make_id: umlaut transliteration -> Python title() -> strip. */
  def makeId(c: Column): Column = {
    val uml = Seq("ä" -> "ae", "ö" -> "oe", "ü" -> "ue",
      "Ä" -> "Ae", "Ö" -> "Oe", "Ü" -> "Ue", "ß" -> "ss")
      .foldLeft(c) { case (x, (k, v)) => regexp_replace(x, k, v) }
    regexp_replace(
      regexp_replace(PyTitleCase(uml), " ", ""),
      "[^A-ZÜÖÄa-z0-9]+", "")
  }

  /** F4 unit-token normalization. */
  def normalizeUnit(c: Column): Column = {
    val stripped = trim(c, " []():")
    val sup = Seq("Â" -> "", "¹" -> "", "²" -> "2", "³" -> "3", "⁴" -> "4",
      "⁵" -> "5", "⁶" -> "6", "⁷" -> "7", "⁸" -> "8", "⁹" -> "9", "°C" -> "Cel")
      .foldLeft(stripped) { case (x, (k, v)) =>
        if (v.isEmpty) regexp_replace(x, k, "") else regexp_replace(x, k, v)
      }
    regexp_replace(regexp_replace(regexp_replace(sup,
      "N/mm2", "MPa"), "Nm", "N.m"), "sec", "s")
  }

  /** F2 cell-type sniff (SQL-expressible core; same regexes as the DuckDB
    * oracle of q11).
    */
  def typeOf(c: Column): Column = {
    import graft.queries.Queries._
    val t = regexp_replace(trim(c), ",", ".")
    when(t === "", "BLANK")
      .when(t.rlike(IntRe), "INT")
      .when(t.rlike(FloatRe), "FLOAT")
      .when(t.rlike(BoolRe), "BOOL")
      .when(t.rlike(IdentRe), "TEXT")
      .when(t.rlike(DateRe), "DATE")
      .when(t.rlike(UriRe), "URI")
      .otherwise("TEXT")
  }

  /** F6 German float re-parse: drop '.' thousands, last ',' -> '.'. */
  def germanFloat(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\.", ""), ",([^,]*)$", ".$1")

  /** F7 quote strip. */
  def quoteStrip(c: Column): Column = regexp_replace(c, "^\"+|\"+$", "")

  /** F9 trailing-colon strip. */
  def colonStrip(c: Column): Column = regexp_replace(c, ":$", "")

  /** Register SQL names for the custom expressions + combinators. */
  def register(spark: SparkSession): Unit = {
    def reg(name: String, f: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, f, "scala_udf")
    reg("py_titlecase", exprs => PyTitleCase(exprs.head))
    ArrayDot.register(spark)
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval(null).asInstanceOf[Number].intValue()
    reg("graft_shingles", exprs => ShinglesOf(exprs.head, intLit(exprs(1))))
    reg("graft_minhash", exprs => MinHashOf(exprs.head, intLit(exprs(1)), intLit(exprs(2))))
    reg("graft_simhash", exprs => SimHash64Of(exprs.head, intLit(exprs(1))))
    reg("graft_lang_scores", exprs => LangScoresOf(exprs.head))
    reg("graft_media_header", exprs => MediaHeaderOf(exprs.head))
    def strLit(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
      e.eval(null).toString
    reg("graft_normalize", exprs => UnicodeNormalize(exprs.head, strLit(exprs(1))))
  }
}
