package graft.csv

import graft.text.PyFloat
import scala.collection.mutable.ArrayBuffer

/** Reproduction of the slice of pandas `read_csv(engine="python")` behavior
  * the reference depends on (annotator.py:594-688, csvw_parser.py:46-95):
  * quote-aware splitting for single-char separators vs raw regex splitting,
  * default NA values, per-column dtype inference (int64/float64/bool/object),
  * "Unnamed: N" header naming and duplicate-name mangling.
  * Behavior pinned by src/test/resources/oracle/stages JSONs.
  */
object PandasCsv {

  // ------------------------------------------------------------- values
  sealed trait PVal {
    def render: String
    def isNaN: Boolean = this == PNaN
  }
  case object PNaN extends PVal { def render = "nan" }
  final case class PInt(v: Long) extends PVal { def render = v.toString }
  final case class PFloat(v: Double) extends PVal { def render = PyFloat.repr(v) }
  final case class PBool(v: Boolean) extends PVal { def render = if (v) "True" else "False" }
  final case class PStr(s: String) extends PVal { def render = s }

  /** pandas default na_values. */
  val NaValues: Set[String] = Set(
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null")

  private val TrueValues = Set("True", "TRUE", "true")
  private val FalseValues = Set("False", "FALSE", "false")

  /** pandas maybe_convert_numeric shape scan (exception/regex-free):
    * 0 = not numeric, 1 = integer, 2 = float. Leading zeros allowed
    * (unlike Python literals); surrounding ASCII whitespace allowed;
    * inf/infinity (any case, signed) is float.
    */
  private def numKind(cell: String): Int = {
    var i = 0
    var j = cell.length
    while (i < j && Character.isWhitespace(cell.charAt(i))) i += 1
    while (j > i && Character.isWhitespace(cell.charAt(j - 1))) j -= 1
    if (i >= j) return 0
    var k = i
    val c0 = cell.charAt(k)
    if (c0 == '+' || c0 == '-') k += 1
    if (k >= j) return 0
    // inf / infinity
    val rem = j - k
    if ((rem == 3 || rem == 8) && (cell.charAt(k) == 'i' || cell.charAt(k) == 'I')) {
      val t = cell.substring(k, j).toLowerCase
      return if (t == "inf" || t == "infinity") 2 else 0
    }
    var digits = 0
    var dot = false
    var exp = false
    var expDigits = 0
    while (k < j) {
      val c = cell.charAt(k)
      if (c >= '0' && c <= '9') { if (exp) expDigits += 1 else digits += 1 }
      else if (c == '.' && !dot && !exp) dot = true
      else if ((c == 'e' || c == 'E') && !exp && digits > 0) {
        exp = true
        if (k + 1 < j && (cell.charAt(k + 1) == '+' || cell.charAt(k + 1) == '-')) k += 1
      } else return 0
      k += 1
    }
    if (digits == 0) 0
    else if (exp && expDigits == 0) 0
    else if (dot || exp) 2
    else 1
  }

  /** The separator regexes with plain-char csv semantics in pandas
    * (single char after regex unescape -> csv module with quoting).
    */
  def singleCharSep(sepRegex: String): Option[Char] = sepRegex match {
    case ";" => Some(';')
    case "," => Some(',')
    case s if s.length == 1 => Some(s.head)
    case _ => None // "\\t", "\\|", ":+\\s+\\s*" are len>1 -> pandas regex path
  }

  /** Split one line (no trailing newline) into raw string cells.
    * Single-char sep: csv-module semantics (quotechar '"', doublequote).
    * Multi-char (regex) sep: pandas does `pat.split(line.strip())` —
    * whole-line strip, quotes literal.
    */
  def splitLine(line: String, sepRegex: String): Vector[String] =
    singleCharSep(sepRegex) match {
      case Some(c) => csvSplit(line, c)
      case None => graft.text.Patterns.split(graft.text.PyStr.strip(line), sepRegex).toVector
    }

  private def csvSplit(line: String, sep: Char): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQuotes = false
    var fieldStart = true
    val n = line.length
    while (i < n) {
      val ch = line.charAt(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < n && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuotes = false
        } else cur += ch
      } else if (ch == '"' && fieldStart) {
        inQuotes = true; fieldStart = false
      } else if (ch == sep) {
        out += cur.toString; cur.clear(); fieldStart = true
      } else {
        cur += ch; fieldStart = false
      }
      i += 1
    }
    out += cur.toString
    out.toVector
  }

  /** Per-column dtype inference + conversion over raw string cells
    * (column-major input). Mirrors maybe_convert_numeric + bool inference.
    */
  def convertColumn(cells: Seq[String]): Vector[PVal] = {
    val nonNa = cells.filterNot(NaValues.contains)
    val hasNa = nonNa.size != cells.size
    if (nonNa.nonEmpty && !hasNa && nonNa.forall(c => numKind(c) == 1) &&
        nonNa.forall(c => parseLongOpt(c).isDefined)) {
      cells.map(c => PInt(parseLongOpt(c).get): PVal).toVector
    } else if (nonNa.nonEmpty && nonNa.forall(c => numKind(c) >= 1)) {
      cells.map(c => if (NaValues.contains(c)) PNaN: PVal else PFloat(parseF(c))).toVector
    } else if (nonNa.nonEmpty && !hasNa &&
               nonNa.forall(c => TrueValues.contains(c) || FalseValues.contains(c))) {
      cells.map(c => PBool(TrueValues.contains(c)): PVal).toVector
    } else {
      cells.map(c => if (NaValues.contains(c)) PNaN: PVal else PStr(c): PVal).toVector
    }
  }

  private def parseLongOpt(s: String): Option[Long] = {
    val t = s.trim
    if (t.isEmpty) return None
    var i = if (t.charAt(0) == '+' || t.charAt(0) == '-') 1 else 0
    if (i >= t.length || t.length - i > 18) {
      // >18 digits may overflow Long: fall back to the exception path
      return try Some(t.toLong) catch { case _: NumberFormatException => None }
    }
    val neg = t.charAt(0) == '-'
    var v = 0L
    while (i < t.length) {
      val c = t.charAt(i)
      if (c < '0' || c > '9') return None
      v = v * 10 + (c - '0')
      i += 1
    }
    Some(if (neg) -v else v)
  }

  private def parseF(s: String): Double = {
    val t = s.trim
    val tl = t.toLowerCase
    if (tl == "inf" || tl == "infinity" || tl == "+inf" || tl == "+infinity") Double.PositiveInfinity
    else if (tl == "-inf" || tl == "-infinity") Double.NegativeInfinity
    else java.lang.Double.parseDouble(t)
  }

  /** Row-major conversion with a fixed column count: rows padded with NA,
    * truncated if longer (ncols <= 0 means use first row's width).
    */
  def convertRows(rows: Seq[Vector[String]], ncols0: Int): Vector[Vector[PVal]] = {
    if (rows.isEmpty) return Vector.empty
    val ncols = if (ncols0 > 0) ncols0 else rows.head.length
    val fixed = rows.map { r =>
      if (r.length >= ncols) r.take(ncols) else r ++ Vector.fill(ncols - r.length)("")
    }
    val cols = (0 until ncols).map(j => convertColumn(fixed.map(_(j))))
    fixed.indices.map(i => (0 until ncols).map(j => cols(j)(i)).toVector).toVector
  }

  /** pandas header naming for a block of header rows (column-major output:
    * one names-tuple per column): "Unnamed: N" / "Unnamed: N_level_M" for
    * NA cells, then duplicate mangling with ".k" suffixes.
    */
  def headerNames(headerRows: Seq[Vector[String]], ncols: Int): Vector[Vector[String]] = {
    val nh = headerRows.size
    val raw = (0 until ncols).map { j =>
      (0 until nh).map { i =>
        val cell = if (j < headerRows(i).length) headerRows(i)(j) else ""
        if (NaValues.contains(cell)) {
          if (nh == 1) s"Unnamed: $j" else s"Unnamed: ${j}_level_$i"
        } else cell
      }.toVector
    }.toVector
    // mangle duplicates: full tuple identity, ".k" appended to last element
    val seen = scala.collection.mutable.HashMap.empty[Vector[String], Int]
    raw.map { t =>
      val k = seen.getOrElse(t, 0)
      seen(t) = k + 1
      if (k == 0) t
      else t.init :+ (t.last + "." + k)
    }
  }
}
