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

  /** Python re.split semantics (trailing empties kept). */
  def split(s: String, regex: String): Array[String] =
    get(regex).split(s, -1)
}
