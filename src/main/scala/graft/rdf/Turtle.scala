package graft.rdf

import scala.collection.mutable.ArrayBuffer

/** Minimal Turtle reader covering the subset rdflib's serializer emits in
  * the reference goldens: prefixes, predicate/object lists (';' ','),
  * anonymous bnode property lists '[...]', collections '(...)', typed /
  * plain / numeric-shorthand literals, 'a'. Produces N-Triples-encoded
  * Triple rows (bnodes as "_:bN").
  */
object Turtle {

  def parse(text: String): Vector[Triple] = new P(text).run()

  private final class P(s: String) {
    private var i = 0
    private val out = ArrayBuffer.empty[Triple]
    private val prefixes = scala.collection.mutable.HashMap.empty[String, String]
    private var bnodeN = 0

    def run(): Vector[Triple] = {
      ws()
      while (i < s.length) {
        if (peekWord("@prefix")) {
          expectWord("@prefix")
          ws()
          val p = until(':'); i += 1
          ws()
          val iri = iriRef()
          ws(); expect('.'); ws()
          prefixes(p) = iri
        } else {
          statement()
          ws()
        }
      }
      out.toVector
    }

    private def statement(): Unit = {
      val subj = node(allowLists = true)
      ws()
      predicateObjectList(subj)
      ws()
      expect('.')
      ws()
    }

    private def predicateObjectList(subj: String): Unit = {
      var done = false
      while (!done) {
        ws()
        val pred = predicate()
        var moreObjs = true
        while (moreObjs) {
          ws()
          val obj = node(allowLists = true)
          out += Triple(subj, pred, obj)
          ws()
          if (i < s.length && s.charAt(i) == ',') { i += 1 } else moreObjs = false
        }
        if (i < s.length && s.charAt(i) == ';') {
          i += 1; ws()
          // trailing ';' before '.' / ']' allowed
          if (i < s.length && (s.charAt(i) == '.' || s.charAt(i) == ']')) done = true
        } else done = true
      }
    }

    private def predicate(): String = {
      if (s.charAt(i) == 'a' && i + 1 < s.length && (s.charAt(i + 1) == ' ' || s.charAt(i + 1) == '\t' || s.charAt(i + 1) == '\n')) {
        i += 1
        Term.RdfType
      } else resource()
    }

    /** node: IRI, prefixed name, literal, bnode property list, collection */
    private def node(allowLists: Boolean): String = {
      ws()
      s.charAt(i) match {
        case '<' => Term.iri(iriRef())
        case '"' => literal()
        case '[' =>
          i += 1
          val bn = freshBnode()
          ws()
          if (s.charAt(i) != ']') predicateObjectList(bn)
          ws(); expect(']')
          bn
        case '(' =>
          i += 1
          ws()
          val items = ArrayBuffer.empty[String]
          while (s.charAt(i) != ')') { items += node(allowLists = true); ws() }
          i += 1
          if (items.isEmpty) Term.RdfNil
          else {
            val nodes = items.indices.map(_ => freshBnode())
            items.indices.foreach { k =>
              out += Triple(nodes(k), Term.RdfFirst, items(k))
              out += Triple(nodes(k), Term.RdfRest,
                if (k == items.length - 1) Term.RdfNil else nodes(k + 1))
            }
            nodes.head
          }
        case '_' =>
          i += 2 // "_:"
          val name = takeWhile(c => c.isLetterOrDigit || c == '_' || c == '-')
          "_:" + name
        case c if c == 't' && peekWord("true") => expectWord("true"); Term.boolean(true)
        case c if c == 'f' && peekWord("false") => expectWord("false"); Term.boolean(false)
        case c if c.isDigit || c == '-' || c == '+' || c == '.' => numericShorthand()
        case _ => resource()
      }
    }

    private def resource(): String = {
      if (s.charAt(i) == '<') return Term.iri(iriRef())
      val pfx = takeWhile(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.')
      expect(':')
      val local = takeWhile(c => !c.isWhitespace && c != ';' && c != ',' &&
        c != ')' && c != ']' && (c != '.' || (i + 1 < s.length && !s.charAt(i + 1).isWhitespace && s.charAt(i + 1) != '\n')))
      Term.iri(prefixes(pfx) + local)
    }

    private def numericShorthand(): String = {
      val start = i
      while (i < s.length && ("+-0123456789.eE".indexOf(s.charAt(i)) >= 0)) i += 1
      var tok = s.substring(start, i)
      // a trailing '.' is the statement terminator, not part of the number
      if (tok.endsWith(".") && !tok.dropRight(1).contains('.')) { tok = tok.dropRight(1); i -= 1 }
      else if (tok.endsWith(".")) { tok = tok.dropRight(1); i -= 1 }
      if (tok.contains('e') || tok.contains('E')) Term.typed(tok, Term.XsdNs + "double")
      else if (tok.contains('.')) Term.typed(tok, Term.XsdNs + "decimal")
      else Term.typed(tok, Term.XsdNs + "integer")
    }

    private def literal(): String = {
      val lex = if (s.startsWith("\"\"\"", i)) {
        i += 3
        val sb = new java.lang.StringBuilder
        while (!s.startsWith("\"\"\"", i)) { unescapeInto(sb) }
        i += 3
        sb.toString
      } else {
        i += 1
        val sb = new java.lang.StringBuilder
        while (s.charAt(i) != '"') { unescapeInto(sb) }
        i += 1
        sb.toString
      }
      if (s.startsWith("^^", i)) {
        i += 2
        val dt = if (s.charAt(i) == '<') iriRef()
        else { val r = resource(); r.substring(1, r.length - 1) }
        Term.typed(lex, dt)
      } else if (i < s.length && s.charAt(i) == '@') {
        i += 1
        val lang = takeWhile(c => c.isLetterOrDigit || c == '-')
        Term.lit(lex) + "@" + lang
      } else Term.lit(lex)
    }

    private def unescapeInto(sb: java.lang.StringBuilder): Unit = {
      val c = s.charAt(i)
      if (c == '\\') {
        i += 1
        s.charAt(i) match {
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
            i += 4
          case 'U' =>
            sb.appendCodePoint(Integer.parseInt(s.substring(i + 1, i + 9), 16))
            i += 8
          case other => sb.append(other)
        }
      } else sb.append(c)
      i += 1
    }

    private def iriRef(): String = {
      expect('<')
      val r = until('>')
      i += 1
      r
    }

    private def freshBnode(): String = { bnodeN += 1; "_:g" + bnodeN }

    private def ws(): Unit = {
      var go = true
      while (go && i < s.length) {
        val c = s.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '#') { while (i < s.length && s.charAt(i) != '\n') i += 1 }
        else go = false
      }
    }
    private def expect(c: Char): Unit = {
      require(i < s.length && s.charAt(i) == c, s"expected '$c' at $i: ...${s.substring(math.max(0, i - 40), math.min(s.length, i + 40))}...")
      i += 1
    }
    private def peekWord(w: String): Boolean = s.startsWith(w, i)
    private def expectWord(w: String): Unit = { require(peekWord(w)); i += w.length }
    private def until(c: Char): String = {
      val j = s.indexOf(c, i)
      val r = s.substring(i, j)
      i = j
      r
    }
    private def takeWhile(f: Char => Boolean): String = {
      val start = i
      while (i < s.length && f(s.charAt(i))) i += 1
      s.substring(start, i)
    }
  }
}
