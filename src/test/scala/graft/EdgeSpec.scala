package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.annotate.Annotator
import graft.ingest.SpanCodec
import graft.link.UnitDict
import graft.rdf.TripleExpand

/** Pathological documents must never throw (cluster resilience): the
  * annotator either produces metadata or produces none, deterministically.
  */
class EdgeSpec extends AnyFunSuite {

  private lazy val dict = UnitDict.default

  private val edgeDocs = Seq(
    "" -> "empty",
    "\n" -> "one empty line",
    "\r\n\r\n" -> "crlf blanks",
    ";;;;\n;;;;\n" -> "separators only",
    "a\n" -> "single bare line",
    "x,y\n" -> "single comma line (votes semicolon-0)",
    ",,,\n,,,\n,,,\n" -> "commas only",
    "k: v\nk: v\n" -> "colon config duplicate keys",
    ("w " * 5000 + "\n") -> "very wide line",
    ("1\t2\n" * 40) -> "numeric tsv",
    "\"unterminated\tquote\n\"\t2\n" -> "broken quotes",
    "a;b\nc\td\ne|f\ng,h,i\nj: k\n" -> "alternating separators",
    "über;äöü\nß;100\n" -> "umlauts",
    "http://a.b/x\thttp://c.d/y\n1\t2\n" -> "uri header")

  for (((text, label), i) <- edgeDocs.zipWithIndex) {
    test(s"edge $i: $label") {
      val doc = SpanCodec.encode(s"edge-$i", text)
      assert(SpanCodec.reconstruct(doc.spans) == text)
      val lines = SpanCodec.lines(doc.spans)
      val meta = Annotator.annotate(s"edge-$i", lines, "utf-8", dict)
      val ts = TripleExpand.expandDoc(meta, lines)
      assert(ts.nonEmpty) // at least the TableGroup + prov triples
      // determinism
      val meta2 = Annotator.annotate(s"edge-$i", lines, "utf-8", dict)
      assert(TripleExpand.expandDoc(meta2, lines) == ts)
    }
  }

  test("vendored QUDT extract is parse-identical to the full reference TTL") {
    val in = getClass.getResourceAsStream(UnitDict.ResourceName)
    assert(in != null, "vendored qudt_unit_extract.ttl missing from classpath")
    in.close()
    if (new java.io.File(UnitDict.DefaultTtlPath).exists()) {
      val full = UnitDict.parseTtl(UnitDict.DefaultTtlPath)
      assert(UnitDict.defaultRows == full)
    }
    assert(dict.size > 2900)
  }
}
