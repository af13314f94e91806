package graft.text

/** Python string-semantics helpers needed to reproduce the reference's
  * cell handling (CSVToCSVW `annotator.py`) on the JVM.
  *
  * Only the *behavior* is reproduced; implementation is original Scala.
  */
object PyStr {

  /** Python `str.isspace` superset used by `str.strip()`. */
  def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c) ||
      c == '\u0085' || c == '\u00a0'

  /** Python `str.strip()` (unicode whitespace, both ends). */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python `str.strip(chars)`. */
  def strip(s: String, chars: String): String = {
    var i = 0
    var j = s.length
    while (i < j && chars.indexOf(s.charAt(i)) >= 0) i += 1
    while (j > i && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(i, j)
  }

  private def isCased(c: Int): Boolean =
    Character.isUpperCase(c) || Character.isLowerCase(c) ||
      Character.getType(c) == Character.TITLECASE_LETTER

  /** Python `str.title()`: first cased char of every run of cased chars is
    * title-cased, the rest lower-cased. Word boundaries are *any* uncased
    * char (digits, punctuation) — unlike Spark's `initcap`, which only
    * splits on whitespace (hence `190C_1000h_1` -> `190C_1000H_1`).
    * Reference: annotator.py:174-184 (`make_id` uses `str.title()`).
    */
  def title(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isCased(cp)) {
        val out = if (prevCased) Character.toLowerCase(cp) else Character.toTitleCase(cp)
        sb.appendCodePoint(out)
        prevCased = true
      } else {
        sb.appendCodePoint(cp)
        prevCased = false
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Python `str.isidentifier()` (approximated with Java unicode identifier
    * classes; exact for ASCII). Used for the literal_eval ValueError-vs-
    * SyntaxError branch split (annotator.py:195-203).
    */
  def isIdentifier(s: String): Boolean = {
    if (s.isEmpty) return false
    val c0 = s.codePointAt(0)
    if (!(Character.isUnicodeIdentifierStart(c0) || c0 == '_')) return false
    var i = Character.charCount(c0)
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!Character.isUnicodeIdentifierPart(cp)) return false
      i += Character.charCount(cp)
    }
    true
  }
}
