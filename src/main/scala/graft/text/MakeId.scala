package graft.text

/** Reproduces the reference's identifier sanitizer `make_id`
  * (annotator.py:174-184): umlaut transliteration, Python `str.title()`,
  * space removal, then stripping everything outside [A-ZÜÖÄa-z0-9].
  */
object MakeId {

  private val Umlauts: Seq[(String, String)] = Seq(
    "ä" -> "ae", "ö" -> "oe", "ü" -> "ue",
    "Ä" -> "Ae", "Ö" -> "Oe", "Ü" -> "Ue", "ß" -> "ss")

  private val Keep = raw"[^A-ZÜÖÄa-z0-9]+".r

  def apply(s: String): String = {
    var t = s
    Umlauts.foreach { case (k, v) => t = t.replace(k, v) }
    Keep.replaceAllIn(PyStr.title(t).replace(" ", ""), "")
  }

  def apply(s: String, filename: String): String = filename + "/" + apply(s)
}
