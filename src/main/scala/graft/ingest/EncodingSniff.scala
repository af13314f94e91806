package graft.ingest

/** Byte-level encoding detection — the engine's equivalent of the
  * reference's `get_encoding` = `chardet.detect` + ISO-8859-1→latin-1
  * alias (annotator.py:217-224, 361-372).
  *
  * Decision procedure (covers every class the reference's fixtures and
  * CSV inputs exercise; no statistical language models for exotic
  * multi-byte encodings):
  *   1. BOM: UTF-8 BOM -> "utf-8-sig" (decode strips it); UTF-16 BOMs
  *      -> "utf-16".
  *   2. Valid UTF-8: chardet's UTF8Prober confidence is
  *      `1 - 0.99 * 0.5^n` for n < 6 multibyte chars (ONE_CHAR_PROB
  *      math), which on Western text LOSES to the Latin1Prober
  *      (typical confidence ~0.5-0.73) when n <= 1 and wins when
  *      n >= 2. So: >= 2 multibyte sequences -> "utf-8"; exactly 1 ->
  *      "latin-1" (this is why the reference's shipped example5.csv —
  *      valid UTF-8 with a single `°` — carries dialect encoding
  *      latin-1 and mojibake titles in its golden; pinned by
  *      IngestSpec). Pure ASCII decodes identically either way ->
  *      "utf-8".
  *   3. Invalid UTF-8 -> "latin-1" (chardet reports ISO-8859-1 for
  *      Western single-byte text; the reference aliases it to latin-1,
  *      which decodes any byte sequence).
  */
object EncodingSniff {

  def detect(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte) return "utf-8-sig"
    if (bytes.length >= 2 &&
        ((bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte) ||
         (bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte))) return "utf-16"
    val mb = multibyteUtf8Chars(bytes)
    if (mb < 0) "latin-1" // invalid utf-8
    else if (mb == 1) "latin-1" // UTF8Prober conf 0.505 < Latin1Prober
    else "utf-8"
  }

  /** Decode with a label [[detect]] produced (or any charset name the
    * reference accepts — latin-1/utf-8-sig aliases included).
    */
  def decode(bytes: Array[Byte], encoding: String): String = encoding match {
    case "utf-8-sig" =>
      new String(bytes, 3, bytes.length - 3, java.nio.charset.StandardCharsets.UTF_8)
    case "latin-1" =>
      new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    case other => new String(bytes, java.nio.charset.Charset.forName(other))
  }

  def isValidUtf8(bytes: Array[Byte]): Boolean = multibyteUtf8Chars(bytes) >= 0

  /** Strict UTF-8 validity scan (RFC 3629: no overlongs, no surrogates,
    * max U+10FFFF) — a single branchy pass, no allocation. Returns the
    * number of multibyte characters, or -1 if the bytes are not valid
    * UTF-8.
    */
  def multibyteUtf8Chars(bytes: Array[Byte]): Int = {
    var i = 0
    var mb = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      if (b0 < 0x80) i += 1
      else if (b0 < 0xC2) return -1 // continuation byte or overlong lead
      else if (b0 < 0xE0) { // 2-byte
        if (i + 1 >= n || (bytes(i + 1) & 0xC0) != 0x80) return -1
        i += 2; mb += 1
      } else if (b0 < 0xF0) { // 3-byte
        if (i + 2 >= n) return -1
        val b1 = bytes(i + 1) & 0xFF
        if ((b1 & 0xC0) != 0x80 || (bytes(i + 2) & 0xC0) != 0x80) return -1
        if (b0 == 0xE0 && b1 < 0xA0) return -1 // overlong
        if (b0 == 0xED && b1 >= 0xA0) return -1 // surrogate
        i += 3; mb += 1
      } else if (b0 < 0xF5) { // 4-byte
        if (i + 3 >= n) return -1
        val b1 = bytes(i + 1) & 0xFF
        if ((b1 & 0xC0) != 0x80 || (bytes(i + 2) & 0xC0) != 0x80 ||
            (bytes(i + 3) & 0xC0) != 0x80) return -1
        if (b0 == 0xF0 && b1 < 0x90) return -1 // overlong
        if (b0 == 0xF4 && b1 >= 0x90) return -1 // > U+10FFFF
        i += 4; mb += 1
      } else return -1
    }
    mb
  }
}
