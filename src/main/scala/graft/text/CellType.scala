package graft.text

/** Re-implementation (from observed behavior, not ported code) of the
  * reference's 7-way cell-type sniff `get_value_type` (annotator.py:187-214):
  *
  *   1. `str.strip()`, then globally replace "," with "." (German decimals).
  *   2. Empty -> BLANK.
  *   3. `ast.literal_eval` semantics:
  *      - int literal   -> INT   (incl. 0x/0o/0b, digit underscores)
  *      - float literal -> FLOAT (incl. scientific; optionally parenthesized)
  *      - True/False    -> BOOL
  *      - parses as *some* Python expression but not a numeric literal
  *        (bare identifier, int arithmetic chain, quoted string, ...)
  *                      -> TEXT  (ValueError branch: date test SKIPPED —
  *                                this is why "May" is TEXT, annotator.py:195)
  *      - SyntaxError   -> DATE if dateutil-acceptable, else URI if it has
  *                         scheme://netloc, else TEXT (annotator.py:197-203)
  *
  * The tags and XSD IRIs match annotator.py exactly; the decision procedure
  * is validated cell-by-cell against a generated oracle
  * (src/test/resources/oracle/typeof.tsv).
  */
object CellType {

  val BLANK = "BLANK"; val INT = "INT"; val FLOAT = "FLOAT"; val BOOL = "BOOL"
  val DATE = "DATE"; val URI = "URI"; val TEXT = "TEXT"

  val XsdOf: Map[String, String] = Map(
    INT -> "http://www.w3.org/2001/XMLSchema#integer",
    FLOAT -> "http://www.w3.org/2001/XMLSchema#double",
    BOOL -> "http://www.w3.org/2001/XMLSchema#boolean",
    DATE -> "http://www.w3.org/2001/XMLSchema#dateTime",
    URI -> "http://www.w3.org/2001/XMLSchema#anyURI",
    TEXT -> "http://www.w3.org/2001/XMLSchema#string")

  // --- Python numeric literal grammar (post comma->dot) ------------------
  private val DigitPart = raw"\d(?:_?\d)*"
  // decimal ints may not have leading zeros unless all-zero
  private val DecInt = raw"(?:[1-9](?:_?\d)*|0(?:_?0)*)"
  private val IntRe =
    raw"(?:$DecInt|0[xX][0-9a-fA-F](?:_?[0-9a-fA-F])*|0[oO][0-7](?:_?[0-7])*|0[bB][01](?:_?[01])*)".r
  private val FloatRe = {
    val point = raw"(?:(?:$DigitPart)?\.$DigitPart|$DigitPart\.)"
    raw"(?:$point(?:[eE][+-]?$DigitPart)?|$DigitPart[eE][+-]?$DigitPart)".r
  }
  // integer arithmetic chain: a valid Python expression (-> literal_eval
  // ValueError -> TEXT without date test); operands must be valid int
  // literals (no leading zeros) or the tokenizer would SyntaxError instead.
  private val IntChainRe = raw"[+-]?$DecInt(?:\s*[-+*/%]\s*$DecInt)+".r
  private val QuotedRe = "(?s)'[^']*'|\"[^\"]*\"".r

  /** Outcome classes of the literal_eval attempt. */
  private sealed trait Lit
  private case object LInt extends Lit
  private case object LFloat extends Lit
  private case object LBool extends Lit
  private case object LExpr extends Lit // ValueError / non-numeric literal
  private case object LSyntaxErr extends Lit

  private def matches(r: scala.util.matching.Regex, s: String) =
    r.pattern.matcher(s).matches()

  private def litKind(input: String): Lit = {
    // peel optional parens and at most one sign, like ast's handling of
    // parenthesized / signed numeric literals
    var t = input
    var signs = 0
    var changed = true
    var balancedParens = true
    while (changed) {
      changed = false
      val s = PyStr.strip(t)
      if (s != t) { t = s; changed = true }
      if (t.length >= 2 && t.head == '(' && t.last == ')' && isBalanced(t)) {
        t = t.substring(1, t.length - 1); changed = true
      } else if (t.nonEmpty && (t.head == '+' || t.head == '-') && signs == 0 &&
                 t.length > 1) {
        // only peel a sign if the remainder could still be numeric-ish
        val rest = PyStr.strip(t.tail)
        if (rest.nonEmpty && (rest.head.isDigit || rest.head == '.' || rest.head == '(')) {
          t = rest; signs += 1; changed = true
        }
      }
    }
    if (t.isEmpty) return LSyntaxErr
    if (t == "True" || t == "False") return if (signs == 0) LBool else LInt
    if (matches(IntRe, t)) return LInt
    if (matches(FloatRe, t)) return LFloat
    if (signs > 0) return LSyntaxErr // sign on a non-number: -abc etc.
    if (PyStr.isIdentifier(t)) return LExpr // bare name -> ValueError
    if (matches(QuotedRe, t)) return LExpr  // string literal -> str -> TEXT
    if (matches(IntChainRe, t)) return LExpr // 2022-8-15, 1/2, 1+2 ...
    LSyntaxErr
  }

  private def isBalanced(s: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0 && i < s.length - 1) return false; if (depth < 0) return false }
      i += 1
    }
    depth == 0
  }

  /** ASCII fast paths for the overwhelmingly common cell shapes (plain
    * ints / d.d floats); behavior identical to the full cascade (pinned
    * by the 169k-cell oracle, which runs through this same entry point).
    */
  private def fastPath(s: String): String = {
    var i = if (s.charAt(0) == '+' || s.charAt(0) == '-') 1 else 0
    if (i >= s.length) return null
    var dots = 0
    var digits = 0
    var exp = false
    var expDigits = 0
    val start = i
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') { if (exp) expDigits += 1 else digits += 1 }
      else if (c == '.' && !exp) dots += 1
      else if ((c == 'e' || c == 'E') && !exp && digits > 0 && dots <= 1) {
        exp = true
        if (i + 1 < s.length && (s.charAt(i + 1) == '+' || s.charAt(i + 1) == '-')) i += 1
      } else return null
      i += 1
    }
    if (digits == 0) return null
    if (exp) return if (expDigits > 0 && dots <= 1) FLOAT else null
    if (dots == 0) {
      // leading zeros (other than a lone run of zeros) are SyntaxError ->
      // date path; let the slow path decide those
      if (s.charAt(start) != '0') {
        if (digits <= 18) INT else null
      } else if (digits == s.length - start) {
        var allZero = true
        var j = start
        while (j < s.length) { if (s.charAt(j) != '0') allZero = false; j += 1 }
        if (allZero) INT else null
      } else null
    } else if (dots == 1) FLOAT
    else null
  }

  /** The full sniff. Mirrors annotator.py:187-214. */
  def typeOf(raw: String): String = {
    if (raw == null) return BLANK
    val s = PyStr.strip(raw).replace(',', '.')
    if (s.isEmpty) return BLANK
    val fp = fastPath(s)
    if (fp != null) return fp
    litKind(s) match {
      case LInt   => INT
      case LFloat => FLOAT
      case LBool  => BOOL
      case LExpr  => TEXT
      case LSyntaxErr =>
        if (DateSniff.isDate(s)) DATE
        else if (isValidUri(s)) URI
        else TEXT
    }
  }

  def xsdOf(tag: String): Option[String] = XsdOf.get(tag)

  /** urlparse-style check: scheme and netloc both present
    * (annotator.py:166-171). Scheme chars per RFC; netloc = text between
    * "//" and the next "/", "?" or "#", must be non-empty.
    */
  def isValidUri(s: String): Boolean = {
    val i = s.indexOf(':')
    if (i <= 0) return false
    val scheme = s.substring(0, i)
    if (!scheme.head.isLetter || !scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return false
    val rest = s.substring(i + 1)
    if (!rest.startsWith("//")) return false
    val auth = rest.drop(2).takeWhile(c => c != '/' && c != '?' && c != '#')
    auth.nonEmpty
  }
}
