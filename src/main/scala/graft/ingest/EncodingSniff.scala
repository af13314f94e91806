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
    // no-BOM UTF-16: alternating-NUL heuristic (ASCII-dominated payloads;
    // chardet itself calls these 'ascii' — documented engine improvement,
    // DIVERGENCES.md). Must run before the UTF-8 branch: NUL bytes are
    // valid UTF-8.
    utf16NoBomOf(bytes) match { case Some(e) => return e; case None => }
    val mb = multibyteUtf8Chars(bytes)
    if (mb >= 2) return "utf-8"
    if (mb == 1) return "latin-1" // UTF8Prober conf 0.505 < Latin1Prober
    if (mb == 0) return "utf-8" // pure ASCII
    // invalid UTF-8: chardet's prober group — every candidate charset
    // scores (validity state machine x character-distribution analysis
    // for the CJK pair; letter-frequency profile for the Cyrillic
    // single-byte family) and the best score above threshold wins;
    // otherwise Western single-byte -> latin-1. Scored (not
    // first-match) because windows-1251 Russian with even-length words
    // can be STRUCTURALLY valid EUC-JP — the distribution decides.
    // utf16Cjk LAST: maxBy keeps the FIRST maximum, so on exact score
    // ties the established single/multi-byte probers win
    val candidates =
      Seq("shift_jis" -> shiftJisScore(bytes), "euc-jp" -> eucJpScore(bytes)) ++
        cyrillicScores(bytes) ++ greekScores(bytes) ++ hebrewScores(bytes) ++
        thaiScores(bytes) ++ utf16CjkScores(bytes)
    val (label, score) = candidates.maxBy(_._2)
    if (score >= 0.5) label else "latin-1"
  }

  /** Decode with a label [[detect]] produced (or any charset name the
    * reference accepts — latin-1/utf-8-sig/python-style utf-16 aliases
    * included).
    */
  def decode(bytes: Array[Byte], encoding: String): String = encoding match {
    case "utf-8-sig" =>
      new String(bytes, 3, bytes.length - 3, java.nio.charset.StandardCharsets.UTF_8)
    case "latin-1" =>
      new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    case "utf-16-le" =>
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16LE)
    case "utf-16-be" =>
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    case other => new String(bytes, java.nio.charset.Charset.forName(other))
  }

  /** No-BOM UTF-16 heuristic: ASCII-heavy UTF-16 shows NULs on one byte
    * parity and almost none on the other. Requires >= 10 even-length
    * bytes, >= 30% NULs on the majority parity, and zero NULs on the
    * minority parity (real UTF-8/single-byte text has no NULs at all,
    * so false positives require adversarial input). CJK-only UTF-16
    * payloads (few NUL high bytes) are not claimed — they fall through
    * to the other probers.
    */
  def utf16NoBomOf(bytes: Array[Byte]): Option[String] = {
    val n = bytes.length
    if (n < 10 || n % 2 != 0) return None
    var zEven = 0; var zOdd = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == 0) { if (i % 2 == 0) zEven += 1 else zOdd += 1 }
      i += 1
    }
    val half = n / 2
    if (zOdd >= half * 3 / 10 && zEven == 0) Some("utf-16-le")
    else if (zEven >= half * 3 / 10 && zOdd == 0) Some("utf-16-be")
    else None
  }

  /** Shift-JIS prober: strict structural validity (single 0x00-0x7F or
    * 0xA1-0xDF half-width katakana; leads 0x81-0x9F / 0xE0-0xFC with
    * trails 0x40-0x7E / 0x80-0xFC) + chardet-style distribution
    * analysis: >= 2 double-byte chars and >= half of them in the
    * hiragana/katakana/JIS-level-1-kanji lead rows (0x82-0x83,
    * 0x88-0x9F) — which is what keeps latin-1 letter pairs like
    * 0xFC 'f' ("Prüfzeit") from being claimed.
    */
  def looksShiftJis(bytes: Array[Byte]): Boolean = shiftJisScore(bytes) >= 0.5

  /** 0 when structurally invalid or < 2 double-byte chars; otherwise
    * the fraction of double-byte chars in the common rows.
    */
  def shiftJisScore(bytes: Array[Byte]): Double = {
    var i = 0; var mb = 0; var common = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      if (b0 <= 0x7F) i += 1
      else if (b0 >= 0xA1 && b0 <= 0xDF) i += 1 // half-width katakana
      else if ((b0 >= 0x81 && b0 <= 0x9F) || (b0 >= 0xE0 && b0 <= 0xFC)) {
        if (i + 1 >= n) return 0
        val b1 = bytes(i + 1) & 0xFF
        if (!((b1 >= 0x40 && b1 <= 0x7E) || (b1 >= 0x80 && b1 <= 0xFC))) return 0
        mb += 1
        if ((b0 >= 0x82 && b0 <= 0x83) || (b0 >= 0x88 && b0 <= 0x9F)) common += 1
        i += 2
      } else return 0 // 0x80, 0xA0, 0xFD-0xFF
    }
    if (mb >= 2) common.toDouble / mb else 0
  }

  /** EUC-JP prober: structural validity (single 0x00-0x7F; 0x8E +
    * 0xA1-0xDF; 0x8F + two 0xA1-0xFE; 0xA1-0xFE pairs) + distribution:
    * >= 2 multibyte chars, >= half with lead in the hiragana/katakana/
    * common-kanji rows (0xA4-0xA5, 0xB0-0xEE).
    */
  def looksEucJp(bytes: Array[Byte]): Boolean = eucJpScore(bytes) >= 0.5

  /** 0 when structurally invalid or < 2 multibyte chars; otherwise the
    * fraction of multibyte chars in the common rows.
    */
  def eucJpScore(bytes: Array[Byte]): Double = {
    var i = 0; var mb = 0; var common = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      if (b0 <= 0x7F) i += 1
      else if (b0 == 0x8E) { // half-width katakana
        if (i + 1 >= n) return 0
        val b1 = bytes(i + 1) & 0xFF
        if (b1 < 0xA1 || b1 > 0xDF) return 0
        mb += 1; i += 2
      } else if (b0 == 0x8F) { // JIS X 0212 three-byte
        if (i + 2 >= n) return 0
        val b1 = bytes(i + 1) & 0xFF; val b2 = bytes(i + 2) & 0xFF
        if (b1 < 0xA1 || b1 > 0xFE || b2 < 0xA1 || b2 > 0xFE) return 0
        mb += 1; i += 3
      } else if (b0 >= 0xA1 && b0 <= 0xFE) {
        if (i + 1 >= n) return 0
        val b1 = bytes(i + 1) & 0xFF
        if (b1 < 0xA1 || b1 > 0xFE) return 0
        mb += 1
        if (b0 == 0xA4 || b0 == 0xA5 || (b0 >= 0xB0 && b0 <= 0xEE)) common += 1
        i += 2
      } else return 0
    }
    if (mb >= 2) common.toDouble / mb else 0
  }

  /** Cyrillic single-byte family (KOI8-R / windows-1251 / ISO-8859-5):
    * chardet-style language-model scoring, simplified — decode the high
    * bytes under each candidate charset and measure the fraction that
    * land on the ~20 most frequent Russian letters (the three charsets
    * place the alphabet at DIFFERENT byte positions, so only the right
    * one lines the text up with the frequency profile). Scores are 0
    * unless high bytes dominate the letter mass (>= 40% of non-space
    * bytes) and >= 8 high bytes exist — Western latin-1 text (5-10%
    * accented letters) never qualifies, so the latin-1 fallback is
    * untouched for the reference's own domain.
    */
  def cyrillicScores(bytes: Array[Byte]): Seq[(String, Double)] = {
    var high = 0; var nonSpace = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b > 0x20 && b != 0x7F) nonSpace += 1
      if (b >= 0x80) high += 1
      i += 1
    }
    if (high < 8 || high * 10 < nonSpace * 4) return Seq.empty
    CyrillicCharsets.map { cs =>
      val decoded = new String(bytes, java.nio.charset.Charset.forName(cs))
      var hits = 0; var letters = 0
      decoded.foreach { c =>
        if (c > 0x7F) {
          letters += 1
          if (CyrillicCommon(c)) hits += 1
        }
      }
      cs -> (if (letters == 0) 0.0 else hits.toDouble / letters)
    }
  }

  val CyrillicCharsets: Seq[String] = Seq("koi8-r", "windows-1251", "iso-8859-5")

  /** The ~20 most frequent Russian LOWERCASE letters. Deliberately not
    * case-folded: running text is ~97% lowercase, and the three
    * charsets disagree precisely on where the cases sit (koi8-r
    * lowercase bytes decode as windows-1251 UPPERCASE and vice versa),
    * so lowercase-only hits are what separate them.
    */
  val CyrillicCommon: Set[Char] = "оеаинтсрвлкмдпуяыьгз".toSet

  /** Shared gate for the single-byte frequency probers (Cyrillic uses
    * the same thresholds inline): >= 8 high bytes and high bytes >= 40%
    * of the non-space mass — Western latin-1 text (5-10% accented)
    * never qualifies, so the latin-1 fallback is untouched.
    */
  private def highByteGate(bytes: Array[Byte]): Boolean = {
    var high = 0; var nonSpace = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b > 0x20 && b != 0x7F) nonSpace += 1
      if (b >= 0x80) high += 1
      i += 1
    }
    high >= 8 && high * 10 >= nonSpace * 4
  }

  /** Frequency-profile score of one charset candidate: the fraction of
    * decoded high characters landing on the language's most frequent
    * letters, with a 2x penalty for characters proving the charset
    * WRONG (C1 controls / unmappable bytes — e.g. Windows smart quotes
    * decode to C1 controls under the matching ISO-8859 charset, which
    * is how windows-125x beats its ISO sibling when either could claim
    * the letters).
    */
  private def freqScore(bytes: Array[Byte], charset: String,
                        common: Set[Char]): Double = {
    val decoded = new String(bytes, java.nio.charset.Charset.forName(charset))
    var hits = 0; var letters = 0; var bad = 0
    decoded.foreach { c =>
      if (c > 0x7F) {
        letters += 1
        if (common(c)) hits += 1
        if ((c >= 0x80 && c <= 0x9F) || c == '�') bad += 1
      }
    }
    if (letters == 0) 0.0 else math.max(0.0, (hits - 2.0 * bad) / letters)
  }

  /** Greek family (reference chardet: Latin7/Win1253 Greek models,
    * annotator.py:217-224): both charsets place the alphabet
    * identically, so plain letter text ties and the candidate ORDER
    * resolves it to iso-8859-7 (chardet lists the ISO model first);
    * text carrying Windows C1-range punctuation (smart quotes, euro)
    * decodes to C1 controls under ISO-8859-7 and flips the verdict to
    * windows-1253 via the freqScore penalty.
    */
  def greekScores(bytes: Array[Byte]): Seq[(String, Double)] =
    if (!highByteGate(bytes)) Seq.empty
    else Seq("iso-8859-7", "windows-1253").map(cs => cs -> freqScore(bytes, cs, GreekCommon))

  val GreekCommon: Set[Char] = "αοιετνσηρπκμυλωγδςάέήίόύώθχφβ".toSet

  /** Hebrew (chardet's HebrewProber shape): iso-8859-8 (visual) and
    * windows-1255 (logical) place the alphabet identically — the
    * DIRECTION decides the label. Logical Hebrew puts final forms
    * (ך ם ן ף ץ) at word END; visual Hebrew stores each line reversed,
    * so finals appear at word START. No finals at all -> windows-1255
    * (logical is the overwhelmingly common modern encoding — chardet's
    * own default).
    */
  def hebrewScores(bytes: Array[Byte]): Seq[(String, Double)] = {
    if (!highByteGate(bytes)) return Seq.empty
    val score = freqScore(bytes, "windows-1255", HebrewCommon)
    if (score == 0.0) return Seq.empty
    val decoded = new String(bytes, java.nio.charset.Charset.forName("windows-1255"))
    def isHeb(c: Char) = c >= 'א' && c <= 'ת'
    var atEnd = 0; var atStart = 0
    var i = 0
    while (i < decoded.length) {
      val c = decoded(i)
      if (HebrewFinals(c)) {
        val prevBoundary = i == 0 || !isHeb(decoded(i - 1))
        val nextBoundary = i == decoded.length - 1 || !isHeb(decoded(i + 1))
        if (prevBoundary && !nextBoundary) atStart += 1
        else if (nextBoundary) atEnd += 1
      }
      i += 1
    }
    Seq((if (atStart > atEnd) "iso-8859-8" else "windows-1255") -> score)
  }

  val HebrewCommon: Set[Char] = "יוהלארתבשמנעםדקכחפסגץטזןךף".toSet
  val HebrewFinals: Set[Char] = "ךםןףץ".toSet

  /** Thai (chardet: TIS-620 via its Thai language model): single
    * candidate, frequency profile over the most common Thai consonants,
    * vowels and tone marks.
    */
  def thaiScores(bytes: Array[Byte]): Seq[(String, Double)] =
    if (!highByteGate(bytes)) Seq.empty
    else Seq("tis-620" -> freqScore(bytes, "TIS-620", ThaiCommon))

  val ThaiCommon: Set[Char] =
    "านรอกเงมยลวสดทตคบปหจแชขษศถพภฟซฯ".toSet ++ "ัิี่้ึืุู็ะำไใโ์๊๋".toSet

  /** No-BOM UTF-16 of CJK-dominated payloads — the one chardet class
    * the engine previously (r3/r4, DIVERGENCES #8) declined to claim.
    * The r4-documented danger is Western aliasing: latin-1/ASCII letter
    * PAIRS read as UTF-16 units land inside the CJK unified block
    * ("Pr" -> U+5072, 0xFC+'f' -> U+FC66-ish), and kana-only UTF-16LE
    * is even VALID ASCII ("B0D0F0" == あいう), so block-membership alone
    * can never discriminate. Two defenses make the claim safe:
    *
    *  1. Reachability: this prober only runs in the invalid-UTF-8
    *     branch, so every ASCII / UTF-8 payload (including the
    *     kana-aliasing product-code class) is out of scope by
    *     construction — exactly the chardet prober-group position.
    *  2. Distribution over LONG windows (the NUL-skeleton-statistics
    *     idea generalized): real Japanese/Chinese running text
    *     concentrates on kana + a small common-kanji core + CJK
    *     punctuation, while aliased Western pairs scatter uniformly
    *     over the 21k-codepoint block (P(hit the ~170-char common set)
    *     ~ 0.8% per unit). The claim needs >= 24 units, >= 80% of
    *     units in CJK ranges, zero structural violations (controls,
    *     lone surrogates), and >= 30% of the CJK mass in the common
    *     core — Western/Cyrillic/Greek/Thai adversaries fail two to
    *     three of those gates at once (battery-pinned in IngestSpec).
    *
    * Hangul-only payloads stay unclaimed: KOI8/1251 Cyrillic letter
    * pairs alias into U+AC00-U+D7AF with plausible density and there
    * is no small "common syllable" core to gate on (DIVERGENCES #8
    * keeps that sub-class documented).
    */
  def utf16CjkScores(bytes: Array[Byte]): Seq[(String, Double)] = {
    val n = bytes.length
    if (n < 48 || n % 2 != 0) return Seq.empty
    def scoreOf(be: Boolean): Double = {
      val units = new Array[Int](n / 2)
      var i = 0
      while (i < n) {
        val hi = bytes(if (be) i else i + 1) & 0xFF
        val lo = bytes(if (be) i + 1 else i) & 0xFF
        units(i / 2) = (hi << 8) | lo
        i += 2
      }
      var cjk = 0; var core = 0; var other = 0
      var j = 0
      while (j < units.length) {
        val u = units(j)
        if (u < 0x20 && u != 0x09 && u != 0x0A && u != 0x0D) return 0 // controls
        if (u >= 0xD800 && u <= 0xDBFF) { // surrogate pair must close
          if (j + 1 >= units.length || units(j + 1) < 0xDC00 ||
              units(j + 1) > 0xDFFF) return 0
          other += 2; j += 2
        } else if (u >= 0xDC00 && u <= 0xDFFF) return 0 // lone low surrogate
        else {
          val isCjk = (u >= 0x3000 && u <= 0x30FF) || // punct + kana
            (u >= 0x4E00 && u <= 0x9FFF) ||           // unified ideographs
            (u >= 0xFF00 && u <= 0xFFEF)              // full/half-width forms
          if (isCjk) {
            cjk += 1
            val isKana = u >= 0x3040 && u <= 0x30FF
            val isPunct = (u >= 0x3000 && u <= 0x303F) || (u >= 0xFF00 && u <= 0xFFEF)
            if (isKana || isPunct || CjkCommon(u.toChar)) core += 1
          } else if (u == 0x20 || u == 0x09 || u == 0x0A || u == 0x0D) ()
          else other += 1
          j += 1
        }
      }
      val total = cjk + other
      if (total < 24 || cjk < total * 8 / 10) return 0
      val dist = core.toDouble / cjk
      if (dist >= 0.3) 0.5 + dist / 2 else 0
    }
    Seq("utf-16-be" -> scoreOf(be = true), "utf-16-le" -> scoreOf(be = false))
      .filter(_._2 > 0)
  }

  /** Common-core ideographs: the high-frequency hanzi/kanji that carry
    * the bulk of running Chinese/Japanese text (public frequency-list
    * knowledge: 的一是不了... / 日本人年月...), plus the kanji numerals
    * and everyday nouns shared by both languages.
    */
  val CjkCommon: Set[Char] =
    ("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得" +
     "就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日" +
     "于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同" +
     "三已老从动两长知民样现分将外但身些与高意进把法此实回二理美点月" +
     "明其种声全工己话儿者向情部正名定女问力机给等几很业最间新什打便" +
     "位因重被走电四第门相次东政海口使教西再平真听世气信北少关并内加" +
     "化由却代军产入先山五太水万市眼体别处总才场师书比住员九笑性通目" +
     "华报立马命张活难神数件安表原车白应路期叫死常提感金何更反题必钱" +
     "日本人年月時分国中大小学生気会社今田川山口目手力女男子文字言語" +
     "東京都道府県市町村駅電車新聞雨空天私見行来食飲読書話買物時間毎" +
     "週末朝昼夜魚肉茶水火木金土曜何名前先生授業宿題試験勉強図館映画").toSet

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
