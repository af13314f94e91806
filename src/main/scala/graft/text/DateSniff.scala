package graft.text

import java.time.{LocalDate, LocalDateTime}
import java.time.temporal.ChronoField
import scala.collection.mutable.ArrayBuffer

/** Scala port of the `dateutil.parser` acceptance algorithm (non-fuzzy,
  * dayfirst=False, yearfirst=False) that the reference's `is_date` /
  * `date_parse` rely on (annotator.py:157-163, 303-310). python-dateutil is
  * Apache-2.0/BSD-licensed public code; this is an original re-implementation
  * of its documented tokenizer + parser semantics, validated cell-by-cell
  * against a generated oracle (src/test/resources/oracle/typeof.tsv).
  *
  * Determinism: dateutil fills missing fields from "today"; this port pins
  * the default to 2024-01-01 (a 31-day month, so bare-day acceptance is
  * identical) and the two-digit-year pivot to 2026.
  */
object DateSniff {

  final case class Parsed(dt: LocalDateTime, micros: Int) {
    /** Python datetime.isoformat() */
    def isoformat: String = {
      val base = f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d" +
        f"T${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
      if (micros != 0) base + f".$micros%06d" else base
    }
  }

  private val DefaultDate = LocalDate.of(2024, 1, 1)
  private val PivotYear = 2026
  private val PivotCentury = PivotYear / 100 * 100

  // ------------------------------------------------------------- lexer
  private def isWordC(c: Char) = Character.isLetter(c)
  private def isNumC(c: Char) = Character.isDigit(c)

  /** Port of dateutil._timelex: runs of letters / digits (dots and commas
    * can glue), everything else single-char; multi-dot or letter-mixed
    * glued tokens are re-split on [.,].
    */
  private[text] def lex(s: String): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isWordC(c)) {
        // state 'a' / 'a.'
        val sb = new StringBuilder
        var seenLetters = true
        var state = 'a'
        var done = false
        sb += c; i += 1
        while (!done && i < n) {
          val d = s.charAt(i)
          state match {
            case 'a' =>
              if (isWordC(d)) { sb += d; i += 1 }
              else if (d == '.') { sb += d; i += 1; state = 'A' } // 'a.'
              else done = true
            case 'A' =>
              if (d == '.' || isWordC(d)) { sb += d; i += 1 }
              else if (isNumC(d) && sb.last == '.') { sb += d; i += 1; state = 'N' }
              else done = true
            case 'N' => // '0.'
              if (d == '.' || isNumC(d)) { sb += d; i += 1 }
              else if (isWordC(d) && sb.last == '.') { sb += d; i += 1; state = 'A' }
              else done = true
          }
        }
        emit(out, sb.toString, state != 'a', seenLetters)
      } else if (isNumC(c)) {
        val sb = new StringBuilder
        var seenLetters = false
        var state = '0'
        var done = false
        sb += c; i += 1
        while (!done && i < n) {
          val d = s.charAt(i)
          state match {
            case '0' =>
              if (isNumC(d)) { sb += d; i += 1 }
              else if (d == '.' || (d == ',' && sb.length >= 2)) { sb += d; i += 1; state = 'N' }
              else done = true
            case 'N' => // '0.'
              if (d == '.' || isNumC(d)) { sb += d; i += 1 }
              else if (isWordC(d) && sb.last == '.') { sb += d; i += 1; state = 'A'; seenLetters = true }
              else done = true
            case 'A' => // 'a.'
              if (d == '.' || isWordC(d)) { sb += d; i += 1; seenLetters = true }
              else if (isNumC(d) && sb.last == '.') { sb += d; i += 1; state = 'N' }
              else done = true
          }
        }
        emit(out, sb.toString, state != '0', seenLetters)
      } else if (Character.isWhitespace(c) || PyStr.isPySpace(c)) {
        out += " "
        i += 1
        // NB: dateutil emits one " " token per whitespace char
      } else {
        out += c.toString
        i += 1
      }
    }
    out.toVector
  }

  private val SplitDecimal = java.util.regex.Pattern.compile("(?<=[.,])|(?=[.,])")

  private def emit(out: ArrayBuffer[String], tokRaw: String, dotted: Boolean, seenLetters: Boolean): Unit = {
    var tok = tokRaw
    if (dotted && (seenLetters || tok.count(_ == '.') > 1 ||
        (tok.nonEmpty && (tok.last == '.' || tok.last == ',')))) {
      val parts = SplitDecimal.split(tok, -1) // split keeping . and , as tokens
      var first = true
      for (p <- parts; if p.nonEmpty) {
        if (first) { out += p; first = false } else out += p
      }
      return
    }
    if (dotted && !tok.contains('.')) tok = tok.replace(',', '.')
    out += tok
  }

  // ------------------------------------------------------------ word sets
  private val Jump = Set(" ", ".", ",", ";", "-", "/", "'",
    "at", "on", "and", "ad", "m", "t", "of", "st", "nd", "rd", "th")
  private val Weekdays = Map(
    "mon" -> 0, "monday" -> 0, "tue" -> 1, "tuesday" -> 1, "wed" -> 2,
    "wednesday" -> 2, "thu" -> 3, "thursday" -> 3, "fri" -> 4, "friday" -> 4,
    "sat" -> 5, "saturday" -> 5, "sun" -> 6, "sunday" -> 6)
  private val Months = Map(
    "jan" -> 1, "january" -> 1, "feb" -> 2, "february" -> 2, "mar" -> 3,
    "march" -> 3, "apr" -> 4, "april" -> 4, "may" -> 5, "jun" -> 6,
    "june" -> 6, "jul" -> 7, "july" -> 7, "aug" -> 8, "august" -> 8,
    "sep" -> 9, "sept" -> 9, "september" -> 9, "oct" -> 10, "october" -> 10,
    "nov" -> 11, "november" -> 11, "dec" -> 12, "december" -> 12)
  private val Hms = Map("h" -> 0, "hour" -> 0, "hours" -> 0,
    "m" -> 1, "minute" -> 1, "minutes" -> 1, "s" -> 2, "second" -> 2, "seconds" -> 2)
  private val Ampm = Map("am" -> 0, "a" -> 0, "pm" -> 1, "p" -> 1)
  private val UtcZone = Set("utc", "gmt", "z")

  private def jump(t: String) = Jump.contains(t.toLowerCase)
  private def monthOf(t: String): Option[Int] = Months.get(t.toLowerCase)
  private def weekdayOf(t: String): Option[Int] = Weekdays.get(t.toLowerCase)
  private def hmsOf(t: String): Option[Int] = Hms.get(t.toLowerCase)
  private def ampmOf(t: String): Option[Int] = Ampm.get(t.toLowerCase)

  // ------------------------------------------------------------- parser
  private final class Res {
    var year, month, day, weekday, hour, minute, second, micros: Option[Int] =
      None
    var ampm: Option[Int] = None
    var tzname: Option[String] = None
    var tzoffset: Option[Int] = None
    def isEmpty: Boolean =
      Seq(year, month, day, weekday, hour, minute, second, micros).forall(_.isEmpty)
  }

  private final class Ymd {
    val vals = ArrayBuffer.empty[Int]
    var centurySpecified = false
    var ystridx, mstridx, dstridx: Option[Int] = None
    def size: Int = vals.size
    def hasYear = ystridx.isDefined
    def hasMonth = mstridx.isDefined
    def hasDay = dstridx.isDefined

    private def monthLen(y: Int, m: Int): Int =
      java.time.YearMonth.of(if (y >= 1 && y <= 9999) y else 2000, m).lengthOfMonth()

    def couldBeDay(value: Int): Boolean =
      if (hasDay) false
      else if (!hasMonth) value >= 1 && value <= 31
      else if (!hasYear) value >= 1 && value <= monthLen(2000, vals(mstridx.get))
      else value >= 1 && value <= monthLen(vals(ystridx.get), vals(mstridx.get))

    def appendStr(v: String, label: Char = 0): Unit = {
      var l = label
      if (v.nonEmpty && v.forall(_.isDigit) && v.length > 2) {
        centurySpecified = true
        if (l != 0 && l != 'Y') throw new IllegalArgumentException
        l = 'Y'
      }
      // Python int(val): digits only (a dotted token raises -> reject)
      if (v.isEmpty || !v.forall(_.isDigit)) throw new NumberFormatException(v)
      push(v.toInt, l)
    }

    def appendNum(v: Double, label: Char = 0): Unit = {
      var l = label
      if (v > 100) {
        centurySpecified = true
        if (l != 0 && l != 'Y') throw new IllegalArgumentException
        l = 'Y'
      }
      push(v.toInt, l)
    }

    private def push(v: Int, label: Char): Unit = {
      vals += v
      label match {
        case 'M' => if (hasMonth) throw new IllegalArgumentException else mstridx = Some(size - 1)
        case 'D' => if (hasDay) throw new IllegalArgumentException else dstridx = Some(size - 1)
        case 'Y' => if (hasYear) throw new IllegalArgumentException else ystridx = Some(size - 1)
        case _ =>
      }
    }

    /** Port of _ymd.resolve_ymd (dayfirst=false, yearfirst=false). */
    def resolve(): (Option[Int], Option[Int], Option[Int]) = {
      val strids = Seq('y' -> ystridx, 'm' -> mstridx, 'd' -> dstridx)
        .collect { case (k, Some(v)) => k -> v }.toMap
      if ((size == strids.size && strids.nonEmpty) || (size == 3 && strids.size == 2)) {
        var m = strids
        if (size == 3 && m.size == 2) {
          val missing = (0 until 3).filterNot(m.values.toSet)
          val key = Seq('y', 'm', 'd').filterNot(m.keySet)
          m = m + (key.head -> missing.head)
        }
        require(size == m.size)
        return (m.get('y').map(vals), m.get('m').map(vals), m.get('d').map(vals))
      }
      var year, month, day: Option[Int] = None
      if (size > 3) throw new IllegalArgumentException("More than three YMD values")
      else if (size == 1 || (mstridx.isDefined && size == 2)) {
        val other = if (mstridx.isDefined) {
          month = Some(vals(mstridx.get))
          vals(if (mstridx.get == 0) size - 1 else mstridx.get - 1)
        } else vals(0)
        if (size > 1 || mstridx.isEmpty) {
          if (other > 31) year = Some(other) else day = Some(other)
        }
      } else if (size == 2) {
        if (vals(0) > 31) { year = Some(vals(0)); month = Some(vals(1)) }
        else if (vals(1) > 31) { month = Some(vals(0)); year = Some(vals(1)) }
        else { month = Some(vals(0)); day = Some(vals(1)) }
      } else if (size == 3) {
        mstridx match {
          case Some(0) =>
            if (vals(1) > 31) { month = Some(vals(0)); year = Some(vals(1)); day = Some(vals(2)) }
            else { month = Some(vals(0)); day = Some(vals(1)); year = Some(vals(2)) }
          case Some(1) =>
            if (vals(0) > 31) { year = Some(vals(0)); month = Some(vals(1)); day = Some(vals(2)) }
            else { day = Some(vals(0)); month = Some(vals(1)); year = Some(vals(2)) }
          case Some(2) =>
            if (vals(1) > 31) { day = Some(vals(0)); year = Some(vals(1)); month = Some(vals(2)) }
            else { year = Some(vals(0)); day = Some(vals(1)); month = Some(vals(2)) }
          case _ =>
            if (vals(0) > 31 || ystridx.contains(0)) {
              year = Some(vals(0)); month = Some(vals(1)); day = Some(vals(2))
            } else if (vals(0) > 12) {
              day = Some(vals(0)); month = Some(vals(1)); year = Some(vals(2))
            } else {
              month = Some(vals(0)); day = Some(vals(1)); year = Some(vals(2))
            }
        }
      }
      (year, month, day)
    }
  }

  private def convertYear(y: Int, centurySpecified: Boolean): Int =
    if (y < 100 && !centurySpecified) {
      var yy = y + PivotCentury
      if (yy >= PivotYear + 50) yy -= 100
      else if (yy < PivotYear - 50) yy += 100
      yy
    } else y

  private def toDec(s: String): Double = {
    val d = java.lang.Double.parseDouble(s)
    if (d.isInfinite || d.isNaN) throw new NumberFormatException(s)
    d
  }

  /** Python float() over a token: digits with at most one dot (tokens never
    * contain signs/exponents from the lexer, but "e"-containing words would
    * be letter tokens anyway; "inf"/"nan" words are handled as words).
    */
  private def tokFloat(s: String): Option[Double] =
    if (s.nonEmpty && s.forall(c => c.isDigit || c == '.') && s.count(_ == '.') <= 1 && s.exists(_.isDigit))
      Some(java.lang.Double.parseDouble(s))
    else None

  private def parsems(v: String): (Int, Int) =
    if (!v.contains('.')) (v.toDouble.toInt, 0)
    else {
      val Array(i, f) = v.split("\\.", 2)
      (i.toInt, (f + "000000").take(6).toInt)
    }

  private def parseMinSec(value: Double): (Int, Option[Int]) = {
    val minute = value.toInt
    val rem = value - minute
    if (rem != 0) (minute, Some((60 * rem).toInt)) else (minute, None)
  }

  private def adjustAmpm(hour: Int, ampm: Int): Int =
    if (hour < 12 && ampm == 1) hour + 12
    else if (hour == 12 && ampm == 0) 0
    else hour

  private def couldBeTzname(res: Res, token: String): Boolean =
    res.hour.isDefined && res.tzname.isEmpty && res.tzoffset.isEmpty &&
      token.length <= 5 &&
      (token.forall(c => c >= 'A' && c <= 'Z') || UtcZone.contains(token.toLowerCase))

  private def findHmsIdx(idx: Int, l: Vector[String]): Option[Int] = {
    val n = l.length
    if (idx + 1 < n && hmsOf(l(idx + 1)).isDefined) Some(idx + 1)
    else if (idx + 2 < n && l(idx + 1) == " " && hmsOf(l(idx + 2)).isDefined) Some(idx + 2)
    else if (idx > 0 && hmsOf(l(idx - 1)).isDefined) Some(idx - 1)
    else if (idx > 1 && idx == n - 1 && l(idx - 1) == " " && hmsOf(l(idx - 2)).isDefined) Some(idx - 2)
    else None
  }

  private def assignHms(res: Res, valueRepr: String, hms: Int): Unit = {
    val value = toDec(valueRepr)
    hms match {
      case 0 =>
        res.hour = Some(value.toInt)
        if (value % 1 != 0) res.minute = Some((60 * (value % 1)).toInt)
      case 1 =>
        val (mi, se) = parseMinSec(value)
        res.minute = Some(mi); se.foreach(s => res.second = Some(s))
      case 2 =>
        val (se, us) = parsems(valueRepr)
        res.second = Some(se); res.micros = Some(us)
    }
  }

  /** Port of parser._parse_numeric_token; returns new idx. */
  private def parseNumeric(l: Vector[String], idx0: Int, ymd: Ymd, res: Res): Int = {
    var idx = idx0
    val valueRepr = l(idx)
    val value = toDec(valueRepr)
    val lenLi = valueRepr.length
    val n = l.length

    if (ymd.size == 3 && (lenLi == 2 || lenLi == 4) && res.hour.isEmpty &&
        (idx + 1 >= n || (l(idx + 1) != ":" && hmsOf(l(idx + 1)).isEmpty))) {
      res.hour = Some(valueRepr.take(2).toInt)
      if (lenLi == 4) res.minute = Some(valueRepr.drop(2).toInt)
    } else if (lenLi == 6 || (lenLi > 6 && valueRepr.indexOf('.') == 6)) {
      if (ymd.size == 0 && !valueRepr.contains('.')) {
        ymd.appendStr(valueRepr.substring(0, 2))
        ymd.appendStr(valueRepr.substring(2, 4))
        ymd.appendStr(valueRepr.substring(4))
      } else {
        res.hour = Some(valueRepr.take(2).toInt)
        res.minute = Some(valueRepr.slice(2, 4).toInt)
        val (se, us) = parsems(valueRepr.drop(4))
        res.second = Some(se); res.micros = Some(us)
      }
    } else if (lenLi == 8 || lenLi == 12 || lenLi == 14) {
      ymd.appendStr(valueRepr.take(4), 'Y')
      ymd.appendStr(valueRepr.slice(4, 6))
      ymd.appendStr(valueRepr.slice(6, 8))
      if (lenLi > 8) {
        res.hour = Some(valueRepr.slice(8, 10).toInt)
        res.minute = Some(valueRepr.slice(10, 12).toInt)
        if (lenLi > 12) res.second = Some(valueRepr.drop(12).toInt)
      }
    } else if (findHmsIdx(idx, l).isDefined) {
      val hmsIdx = findHmsIdx(idx, l).get
      val (newIdx, hms) =
        if (hmsIdx > idx) (hmsIdx, hmsOf(l(hmsIdx)).get)
        else (idx, hmsOf(l(hmsIdx)).get + 1)
      idx = newIdx
      if (hms <= 2) assignHms(res, valueRepr, hms)
    } else if (idx + 2 < n && l(idx + 1) == ":") {
      res.hour = Some(value.toInt)
      val v2 = toDec(l(idx + 2))
      val (mi, se) = parseMinSec(v2)
      res.minute = Some(mi); se.foreach(s => res.second = Some(s))
      if (idx + 4 < n && l(idx + 3) == ":") {
        val (s2, us) = parsems(l(idx + 4))
        res.second = Some(s2); res.micros = Some(us)
        idx += 2
      }
      idx += 2
    } else if (idx + 1 < n && (l(idx + 1) == "-" || l(idx + 1) == "/" || l(idx + 1) == ".")) {
      val sep = l(idx + 1)
      ymd.appendStr(valueRepr)
      if (idx + 2 < n && !jump(l(idx + 2))) {
        if (l(idx + 2).forall(_.isDigit) && l(idx + 2).nonEmpty) ymd.appendStr(l(idx + 2))
        else monthOf(l(idx + 2)) match {
          case Some(m) => ymd.appendNum(m, 'M')
          case None => throw new IllegalArgumentException
        }
        if (idx + 3 < n && l(idx + 3) == sep) {
          monthOf(l(idx + 4)) match {
            case Some(m) => ymd.appendNum(m, 'M')
            case None => ymd.appendStr(l(idx + 4))
          }
          idx += 2
        }
        idx += 1
      }
      idx += 1
    } else if (idx + 1 >= n || jump(l(idx + 1))) {
      if (idx + 2 < n && ampmOf(l(idx + 2)).isDefined) {
        res.hour = Some(adjustAmpm(value.toInt, ampmOf(l(idx + 2)).get))
        idx += 1
      } else {
        ymd.appendNum(value)
      }
      idx += 1
    } else if (ampmOf(l(idx + 1)).isDefined && value >= 0 && value < 24) {
      res.hour = Some(adjustAmpm(value.toInt, ampmOf(l(idx + 1)).get))
      idx += 1
    } else if (ymd.couldBeDay(value.toInt)) {
      ymd.appendNum(value)
    } else {
      throw new IllegalArgumentException
    }
    idx
  }

  /** Word tokens dateutil can ever accept (months, weekdays, hms, am/pm,
    * jump words, utc zones) — everything else makes _parse raise, so we
    * reject exception-free up front (the hot path: most TEXT cells).
    * <=5-char all-uppercase tokens may be tzname candidates and pass.
    */
  private def wordAcceptable(t: String): Boolean = {
    val lo = t.toLowerCase
    Months.contains(lo) || Weekdays.contains(lo) || Hms.contains(lo) ||
      Ampm.contains(lo) || UtcZone.contains(lo) || Jump.contains(lo) ||
      (t.length <= 5 && t.forall(c => c >= 'A' && c <= 'Z'))
  }

  def parse(raw: String): Option[Parsed] =
    try {
      val l = lex(raw)
      // exception-free prefilter: any never-acceptable word token -> None
      var pi = 0
      while (pi < l.length) {
        val t = l(pi)
        if (t.length > 0 && isWordC(t.charAt(0)) && tokFloat(t).isEmpty &&
            !wordAcceptable(t)) return None
        pi += 1
      }
      val res = new Res
      val ymd = new Ymd
      val n = l.length
      var i = 0
      while (i < n) {
        val tok = l(i)
        if (tokFloat(tok).isDefined) {
          i = parseNumeric(l, i, ymd, res)
        } else if (weekdayOf(tok).isDefined) {
          res.weekday = weekdayOf(tok)
        } else if (monthOf(tok).isDefined) {
          ymd.appendNum(monthOf(tok).get, 'M')
          if (i + 1 < n) {
            if (l(i + 1) == "-" || l(i + 1) == "/") {
              val sep = l(i + 1)
              ymd.appendStr(l(i + 2))
              if (i + 3 < n && l(i + 3) == sep) { ymd.appendStr(l(i + 4)); i += 2 }
              i += 2
            } else if (i + 4 < n && l(i + 1) == " " && l(i + 3) == " " &&
                       l(i + 2).toLowerCase == "of") {
              if (l(i + 4).forall(_.isDigit) && l(i + 4).nonEmpty)
                ymd.appendStr(convertYear(l(i + 4).toInt, centurySpecified = false).toString, 'Y')
              i += 4
            }
          }
        } else if (ampmOf(tok).isDefined) {
          // non-fuzzy _ampm_valid
          if (res.hour.isEmpty) throw new IllegalArgumentException
          val h = res.hour.get
          if (h < 0 || h > 12) throw new IllegalArgumentException
          res.hour = Some(adjustAmpm(h, ampmOf(tok).get))
          res.ampm = ampmOf(tok)
        } else if (couldBeTzname(res, tok)) {
          res.tzname = Some(tok)
          res.tzoffset = if (UtcZone.contains(tok.toLowerCase)) Some(0) else None
          // GMT+3-style sign flip is acceptance-neutral here
        } else if (res.hour.isDefined && (tok == "+" || tok == "-")) {
          val sign = if (tok == "+") 1 else -1
          if (i + 1 >= n) throw new IllegalArgumentException
          val nx = l(i + 1)
          val lenLi = nx.length
          var hourOff = 0; var minOff = 0
          if (lenLi == 4) { hourOff = nx.take(2).toInt; minOff = nx.drop(2).toInt }
          else if (i + 2 < n && l(i + 2) == ":") { hourOff = nx.toInt; minOff = l(i + 3).toInt; i += 2 }
          else if (lenLi <= 2) { hourOff = nx.take(2).toInt }
          else throw new IllegalArgumentException
          res.tzoffset = Some(sign * (hourOff * 3600 + minOff * 60))
          i += 1
        } else if (!jump(tok)) {
          throw new IllegalArgumentException(tok)
        }
        i += 1
      }
      val (y, m, d) = ymd.resolve()
      val year = y.map(v => convertYear(v, ymd.centurySpecified))
      if (res.isEmpty && year.isEmpty && m.isEmpty && d.isEmpty) return None
      build(res, year, m, d)
    } catch {
      case _: RuntimeException => None
    }

  private def build(res: Res, year: Option[Int], month: Option[Int], day: Option[Int]): Option[Parsed] = {
    val cy = year.getOrElse(DefaultDate.getYear)
    val cm = month.getOrElse(DefaultDate.getMonthValue)
    var cd = day.getOrElse(DefaultDate.getDayOfMonth)
    if (day.isEmpty) {
      val ml = try java.time.YearMonth.of(cy, cm).lengthOfMonth() catch { case _: Exception => return None }
      if (cd > ml) cd = ml
    }
    if (cy < 1 || cy > 9999) return None
    try {
      val dt = LocalDateTime.of(cy, cm, cd,
        res.hour.getOrElse(0), res.minute.getOrElse(0), res.second.getOrElse(0))
      // weekday-only adjustment skipped (acceptance-neutral)
      Some(Parsed(dt, res.micros.getOrElse(0)))
    } catch {
      case _: java.time.DateTimeException => None
    }
  }

  def isDate(s: String): Boolean = parse(s).isDefined
}
