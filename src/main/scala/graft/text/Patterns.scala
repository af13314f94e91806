package graft.text

import java.util.regex.Pattern
import java.util.concurrent.ConcurrentHashMap

/** Process-wide compiled-regex cache: String.split(regex) recompiles the
  * Pattern on every call for multi-char regexes, which dominates the
  * per-line hot path at scale.
  */
object Patterns {
  private val cache = new ConcurrentHashMap[String, Pattern]()

  def get(regex: String): Pattern = {
    val p = cache.get(regex)
    if (p != null) p
    else {
      val c = Pattern.compile(regex)
      cache.putIfAbsent(regex, c)
      c
    }
  }

  /** Python re.split semantics (trailing empties kept). Literal
    * single-char separators (incl. the escaped "\\t" / "\\|" forms)
    * bypass the regex engine entirely.
    */
  def split(s: String, regex: String): Array[String] = {
    val ch: Int = regex match {
      case ";" => ';'
      case "," => ','
      case "\\t" => '\t'
      case "\\|" => '|'
      case _ => -1
    }
    if (ch < 0) return get(regex).split(s, -1)
    val c = ch.toChar
    var n = 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == c) n += 1; i += 1 }
    val out = new Array[String](n + 1)
    var start = 0
    var k = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == c) { out(k) = s.substring(start, i); k += 1; start = i + 1 }
      i += 1
    }
    out(k) = s.substring(start)
    out
  }
}
