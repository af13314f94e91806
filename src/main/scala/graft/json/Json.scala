package graft.json

import scala.collection.mutable.ArrayBuffer

/** Minimal ordered JSON AST + renderer + parser. Key order is preserved
  * (the reference emits Python dicts whose insertion order the goldens
  * reflect); numbers keep their exact source rendering so Python
  * repr-formatted doubles survive a round trip.
  */
sealed trait JValue {
  def render: String = {
    val sb = new java.lang.StringBuilder
    Json.write(this, sb)
    sb.toString
  }
}
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  def get(k: String): Option[JValue] = fields.find(_._1 == k).map(_._2)
  def apply(k: String): JValue = get(k).getOrElse(JNull)
}
object JObj { def of(fs: (String, JValue)*): JObj = JObj(fs.toVector) }
final case class JArr(items: Vector[JValue]) extends JValue
object JArr { def of(vs: JValue*): JArr = JArr(vs.toVector) }
final case class JStr(s: String) extends JValue
/** Raw numeric literal (already rendered, e.g. "832.756", "17"). */
final case class JNum(literal: String) extends JValue {
  def toDouble: Double = literal.toDouble
}
final case class JBool(b: Boolean) extends JValue
case object JNull extends JValue

object Json {

  def num(l: Long): JNum = JNum(l.toString)

  private[json] def write(v: JValue, sb: java.lang.StringBuilder): Unit = v match {
    case JObj(fs) =>
      sb.append('{')
      var first = true
      fs.foreach { case (k, fv) =>
        if (!first) sb.append(", ")
        first = false
        writeString(k, sb); sb.append(": "); write(fv, sb)
      }
      sb.append('}')
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(", ")
        first = false
        write(it, sb)
      }
      sb.append(']')
    case JStr(s) => writeString(s, sb)
    case JNum(l) => sb.append(l)
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNull => sb.append("null")
  }

  private def writeString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  // ----------------------------------------------------------- parser
  def parse(s: String): JValue = {
    val p = new Parser(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected $c at $pos")
      pos += 1
    }
    def value(): JValue = {
      ws()
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => pos += 4; JBool(true)
        case 'f' => pos += 5; JBool(false)
        case 'n' => pos += 4; JNull
        case _ => numTok()
      }
    }
    private def obj(): JObj = {
      expect('{'); ws()
      val fs = ArrayBuffer.empty[(String, JValue)]
      if (s.charAt(pos) == '}') { pos += 1; return JObj(fs.toVector) }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        fs += (k -> value())
        ws()
        if (s.charAt(pos) == ',') pos += 1 else { expect('}'); done = true }
      }
      JObj(fs.toVector)
    }
    private def arr(): JArr = {
      expect('['); ws()
      val items = ArrayBuffer.empty[JValue]
      if (s.charAt(pos) == ']') { pos += 1; return JArr(items.toVector) }
      var done = false
      while (!done) {
        items += value()
        ws()
        if (s.charAt(pos) == ',') pos += 1 else { expect(']'); done = true }
      }
      JArr(items.toVector)
    }
    private def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
          }
        } else sb.append(c)
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def numTok(): JNum = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      JNum(s.substring(start, pos))
    }
  }
}
