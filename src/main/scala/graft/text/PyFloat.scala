package graft.text

/** Python `repr(float)` formatting (shortest round-trip digits, fixed
  * notation for 1e-4 <= |x| < 1e16, else scientific with 2+ exponent
  * digits). Java's Double.toString produces the same shortest digits but
  * different formatting, so we reformat.
  */
object PyFloat {

  def repr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val s = java.lang.Double.toString(math.abs(d)) // shortest round-trip
    // parse Java form: digits[.digits][E[-]exp]
    val (mant, exp10) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val digitsRaw = (mant.substring(0, dot) + mant.substring(dot + 1))
    // exponent of the leading digit (normalized d.ddd * 10^e)
    val intLen = dot
    var digits = digitsRaw.dropWhile(_ == '0')
    val leadZeros = digitsRaw.length - digits.length
    digits = digits.reverse.dropWhile(_ == '0').reverse
    if (digits.isEmpty) digits = "0"
    val e = intLen - 1 - leadZeros + exp10
    val sign = if (neg) "-" else ""
    if (e >= -4 && e < 16) {
      // fixed
      if (e >= 0) {
        val intPart =
          if (digits.length > e + 1) digits.substring(0, e + 1)
          else digits + "0" * (e + 1 - digits.length)
        val frac = if (digits.length > e + 1) digits.substring(e + 1) else ""
        sign + intPart + "." + (if (frac.isEmpty) "0" else frac)
      } else {
        sign + "0." + "0" * (-e - 1) + digits
      }
    } else {
      val mantStr =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (e < 0) "-" else "+"
      sign + mantStr + "e" + es + f"${math.abs(e)}%02d"
    }
  }
}
