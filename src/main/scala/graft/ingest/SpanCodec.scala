package graft.ingest

import graft.annotate.Annotator
import graft.text.{CellType, PyStr}

/** The engine's input row shape (BASELINE.json input_hint):
  * (doc_id, spans: array<struct<kind,text,media_ref,offset>>).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)
final case class Doc(doc_id: String, spans: Seq[Span])

/** Deterministic text <-> span encoding (FIXTURES.md §1).
  *
  * - Each line of the decoded document becomes one `text` span whose text is
  *   the exact slice *including* its newline terminator, so
  *   `reconstruct(spans) == original` by plain concatenation.
  * - Each cell that is a URI by the reference's rule (urlparse has scheme
  *   and netloc, annotator.py:166-171) additionally yields an interleaved
  *   `media` span right after its line (media_ref = the URI).
  */
object SpanCodec {

  def splitKeepNewlines(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == '\n') {
        out += text.substring(start, i + 1)
        start = i + 1
      }
      i += 1
    }
    if (start < text.length) out += text.substring(start)
    out.result()
  }

  def encode(docId: String, text: String): Doc = {
    val lines = splitKeepNewlines(text)
    val spans = Vector.newBuilder[Span]
    var off = 0
    lines.foreach { line =>
      spans += Span("text", line, null, off)
      off += 1
      val (sep, _) = Annotator.vote(line)
      if (sep != null) {
        graft.text.Patterns.split(line.stripSuffix("\n").stripSuffix("\r"), sep).foreach { cell =>
          val c = PyStr.strip(cell)
          if (CellType.isValidUri(c)) {
            spans += Span("media", cell, c, off)
            off += 1
          }
        }
      }
    }
    Doc(docId, spans.result())
  }

  /** Text spans in offset order reconstruct the document exactly. */
  def reconstruct(spans: Seq[Span]): String =
    spans.filter(_.kind == "text").sortBy(_.offset).map(_.text).mkString

  /** The annotator's input: text-span lines in offset order. */
  def lines(spans: Seq[Span]): IndexedSeq[String] =
    spans.filter(_.kind == "text").sortBy(_.offset).map(_.text).toIndexedSeq
}
