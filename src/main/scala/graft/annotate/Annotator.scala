package graft.annotate

import graft.csv.PandasCsv
import graft.csv.PandasCsv._
import graft.link.{UnitDict, UnitHit}
import graft.text.{CellType, DateSniff, MakeId, PyFloat, PyStr}
import scala.collection.mutable.ArrayBuffer

/** Per-document annotation engine: run-length segmentation over lines,
  * block classification, key-value meta serialization and data-table
  * schema inference — reproducing CSVToCSVW's `CSV_Annotator`
  * (annotator.py:323-920) semantics from scratch.
  *
  * Everything here is a pure function of (doc lines, unit dict); documents
  * are bounded (sampling caps: 30 lines classify / 20 values format), so
  * the engine runs embarrassingly parallel over a `Dataset[Doc]` with zero
  * shuffles (see graft.Pipeline).
  */
object Annotator {

  /** the order is important: first-wins tie break (annotator.py:92-93) */
  val SeparatorRegexes: Vector[String] = Vector(";", "\\|", ":+\\s+\\s*", "\\t", ",")

  /** Per-line separator vote (annotator.py:254-277). `line` must include
    * its trailing newline (the reference scans io.StringIO lines).
    * Returns (sepRegex, count) or (null, 0) when no separator matches.
    */
  /** Java regex \s (the semantics the oracle-validated patterns used). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def vote(line: String): (String, Int) = {
    // single fused scan: ';' '|' '\t' ',' are plain char counts; the colon
    // regex ":+\\s+\\s*" counts maximal colon-runs followed by >=1
    // whitespace (whitespace is NOT consumed here so tab counts stay exact)
    var cSemi = 0; var cPipe = 0; var cColon = 0; var cTab = 0; var cComma = 0
    var i = 0
    val n = line.length
    while (i < n) {
      line.charAt(i) match {
        case ';' => cSemi += 1; i += 1
        case '|' => cPipe += 1; i += 1
        case '\t' => cTab += 1; i += 1
        case ',' => cComma += 1; i += 1
        case ':' =>
          while (i < n && line.charAt(i) == ':') i += 1
          if (i < n && isWs(line.charAt(i))) cColon += 1
        case _ => i += 1
      }
    }
    val counts = Array(cSemi, cPipe, cColon, cTab, cComma)
    var best = 0
    var bi = 1
    while (bi < 5) { if (counts(bi) > counts(best)) best = bi; bi += 1 }
    val bestCount = counts(best)
    if (bestCount == 0) return (null, 0) // re.search on the winner fails
    if (best == 4) {
      // German decimal commas: prefer the runner-up when within one
      var sb = 0
      var j = 1
      while (j < 4) { if (counts(j) > counts(sb)) sb = j; j += 1 }
      if (counts(sb) >= bestCount - 1) return (SeparatorRegexes(sb), counts(sb))
    }
    (SeparatorRegexes(best), bestCount)
  }

  private def numberCoalesce(t: String): String =
    if (t == CellType.INT || t == CellType.FLOAT) "NUMBER" else t

  /** Run-length segmentation + merge + classification + no-data fallback +
    * part numbering (annotator.py:406-592). `rawLines` include newlines.
    */
  def segment(rawLines: IndexedSeq[String]): Vector[(String, Part)] = {
    if (rawLines.isEmpty) return Vector.empty
    val votes = rawLines.map(vote)
    // maximal runs of equal (sep, count)
    val parts = ArrayBuffer.empty[Part]
    var runStart = 0
    var i = 1
    while (i <= votes.length) {
      if (i == votes.length || votes(i) != votes(runStart)) {
        val (sep, count) = votes(runStart)
        parts += Part(runStart, i, sep, count, "unknown", hasHeaderRow = false)
        runStart = i
      }
      i += 1
    }
    val kept = parts.filter(_.sep != null).toVector

    val classified = kept.map { p =>
      if (p.end - p.start == 1 || p.sep == ":+\\s+\\s*") p.copy(segType = "meta")
      else classify(rawLines, p)
    }
    // no-data fallback (annotator.py:570-579)
    val hasData = classified.exists(_.segType == "data")
    val fixed =
      if (hasData) classified
      else classified.map(p => if (p.hasHeaderRow) p.copy(segType = "data") else p)
    // numbering in document order
    var tn = 0; var mn = 0
    fixed.flatMap { p =>
      p.segType match {
        case "data" => tn += 1; Some(s"table-$tn" -> p)
        case "meta" => mn += 1; Some(s"meta-$mn" -> p)
        case _ => None
      }
    }
  }

  /** Type-matrix classification of one multi-line segment
    * (annotator.py:488-568). Uses raw regex split (no quote handling).
    */
  private def classify(rawLines: IndexedSeq[String], p: Part): Part = {
    val sample = (p.start until math.min(p.end, p.start + 30)).map { i =>
      graft.text.Patterns.split(rawLines(i), p.sep).map(c => numberCoalesce(CellType.typeOf(c))).toVector
    }
    val first = sample.head
    val sameTypesAsFirst = sample.forall(_ == first)
    val firstColumnTypeText = sample.forall(r => r.headOption.contains(CellType.TEXT))
    var nHeader = 0
    while (nHeader < sample.length && sample(nHeader).forall(_ == CellType.TEXT)) nHeader += 1
    val dataArea = sample.drop(nHeader)
    val columnValuesEqualType =
      dataArea.nonEmpty && dataArea.head.indices.forall { j =>
        dataArea.forall(_(j) == dataArea.head(j))
      }
    val hasHeaderRow = sample.length >= 2 &&
      first.forall(_ == CellType.TEXT) && first.length > 1 &&
      sample.drop(1).exists(_.drop(1).exists(_ != CellType.TEXT))
    val segType =
      if (sameTypesAsFirst && firstColumnTypeText) "meta"
      else if (firstColumnTypeText && !columnValuesEqualType && !hasHeaderRow) "meta"
      else "data"
    p.copy(segType = segType, hasHeaderRow = hasHeaderRow)
  }

  // ------------------------------------------------------------ meta part

  /** __get_data_meta_part (annotator.py:594-627): parse the segment with
    * col_count columns, drop duplicate keys (keep first), require >=1
    * non-null value. Returns (param, partRowIdx, values).
    */
  def metaPart(lines: IndexedSeq[String], p: Part): Vector[(String, Int, Vector[PVal])] = {
    val colCount = p.count + 1
    val raw = (p.start until p.end).map(i => PandasCsv.splitLine(pandasLine(lines(i)), p.sep))
    val typed = PandasCsv.convertRows(raw, colCount)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val out = ArrayBuffer.empty[(String, Int, Vector[PVal])]
    typed.zipWithIndex.foreach { case (row, idx) =>
      val param = row.head.render
      if (!seen.contains(param)) {
        seen += param
        val values = row.tail
        if (values.exists(!_.isNaN)) out += ((param, idx, values))
      }
    }
    out.toVector
  }

  /** strip trailing newline/carriage-return like pandas' line reader */
  private def pandasLine(l: String): String =
    l.stripSuffix("\n").stripSuffix("\r")

  /** __serialize_meta (annotator.py:690-763), including its sticky
    * unit-context and retroactive unit attachment quirks.
    */
  def serializeMeta(params: Vector[(String, Int, Vector[PVal])], rowOffset: Int,
                    namespace: String, dict: UnitDict): Vector[Note] =
    params.map { case (param0, row, values) =>
      var parmName = param0
      if (parmName.nonEmpty && parmName.last == ':') parmName = parmName.init
      var unitJson: Option[UnitHit] =
        if (parmName.split(" ", -1).length > 1)
          dict.lookup(parmName.split(" ").last)
        else None
      if (unitJson.isDefined) parmName = rsplitOnce(parmName, " ")._1
      val id = namespace + MakeId(parmName) + (row + rowOffset).toString
      val label = PyStr.strip(parmName, "\"")
      val bodies = ArrayBuffer.empty[Body]
      for (v <- values) {
        val value = PyStr.strip(v.render, "\"")
        var toTest = value
        var break = false
        for (part <- toTest.split(" ", -1) if !break) {
          val hit = dict.lookup(PyStr.strip(part))
          if (hit.isDefined) {
            unitJson = hit
            if (hit.get.iri != UnitDict.NumIri)
              toTest = PyStr.strip(toTest.replace(part, ""))
            if (toTest.isEmpty) {
              // unit-only cell: attach to every QuantityValue already in body
              if (bodies.exists(_.isInstanceOf[QuantityBody]))
                for (i <- bodies.indices) bodies(i) match {
                  case q: QuantityBody =>
                    bodies(i) = q.copy(unit = Some(UnitRef(hit.get.iri, hit.get.rdfType)))
                  case _ =>
                }
            }
            break = true
          }
        }
        if (value != "nan" && value != "None" && toTest.nonEmpty) {
          describeValue(toTest) match {
            case Some(q: QuantityBody) =>
              bodies += q.copy(unit = unitJson.map(h => UnitRef(h.iri, h.rdfType)))
            case Some(_) =>
              describeValue(value).foreach(bodies += _)
            case None =>
          }
        }
      }
      Note(id, label, row + rowOffset, bodies.toVector)
    }

  private def rsplitOnce(s: String, sep: String): (String, String) = {
    val i = s.lastIndexOf(sep)
    if (i < 0) (s, "") else (s.substring(0, i), s.substring(i + sep.length))
  }

  /** describe_value (annotator.py:280-320). Input is a rendered string. */
  def describeValue(s: String): Option[Body] = {
    CellType.typeOf(s) match {
      case CellType.INT =>
        Some(QuantityBody(pyInt(s), CellType.XsdOf(CellType.INT), None))
      case CellType.BOOL =>
        // Python bool(non-empty string) is always True (annotator.py:293)
        Some(QuantityBody("true", CellType.XsdOf(CellType.BOOL), None))
      case CellType.FLOAT =>
        val f = java.lang.Double.parseDouble(floatNormalize(s))
        Some(QuantityBody(PyFloat.repr(f), CellType.XsdOf(CellType.FLOAT), None))
      case CellType.DATE =>
        DateSniff.parse(s).map(p =>
          QuantityBody("\"" + p.isoformat + "\"", CellType.XsdOf(CellType.DATE), None))
      case CellType.URI =>
        Some(UriBody(s))
      case _ =>
        Some(TextBody(PyStr.strip(s)))
    }
  }

  /** python float(strip + comma->dot); int(str) with sign/underscores */
  private def floatNormalize(s: String): String = {
    var t = PyStr.strip(s).replace(',', '.')
    // peel parens like ast for "(1.2)"
    while (t.length >= 2 && t.head == '(' && t.last == ')')
      t = PyStr.strip(t.substring(1, t.length - 1))
    if (t.equalsIgnoreCase("inf") || t.equalsIgnoreCase("+inf")) "Infinity"
    else if (t.equalsIgnoreCase("-inf")) "-Infinity"
    else t
  }

  private def pyInt(s: String): String = {
    var t = PyStr.strip(s).replace(",", ".").replace("_", "")
    while (t.length >= 2 && t.head == '(' && t.last == ')')
      t = PyStr.strip(t.substring(1, t.length - 1))
    val neg = t.startsWith("-")
    if (t.startsWith("+") || t.startsWith("-")) t = PyStr.strip(t.tail)
    val v =
      if (t.startsWith("0x") || t.startsWith("0X")) java.lang.Long.parseLong(t.drop(2), 16)
      else if (t.startsWith("0o") || t.startsWith("0O")) java.lang.Long.parseLong(t.drop(2), 8)
      else if (t.startsWith("0b") || t.startsWith("0B")) java.lang.Long.parseLong(t.drop(2), 2)
      else t.toLong
    (if (neg) -v else v).toString
  }

  // ------------------------------------------------------------ data part

  final case class TablePart(headerRows: Int, columns: Vector[Vector[String]],
                             cells: Vector[Vector[PVal]])

  /** __get_data_table_part (annotator.py:629-688): leading all-TEXT/BLANK
    * header-row count (scan runs to EOF, reference quirk), then a pandas
    * read of the data area with header-derived column names.
    */
  def tablePart(lines: IndexedSeq[String], p: Part): TablePart = {
    // header count scan: raw regex split, from part start to EOF
    var counter = 0
    var nHeader = 0
    var broke = false
    var i = p.start
    while (i < lines.length && !broke) {
      val allText = graft.text.Patterns.split(lines(i), p.sep).forall { c =>
        val t = CellType.typeOf(c)
        t == CellType.BLANK || t == CellType.TEXT
      }
      if (allText) counter += 1
      else { nHeader = counter; broke = true }
      i += 1
    }
    if (!broke) nHeader = 0
    val nData = p.end - p.start - nHeader
    if (nData <= 0)
      return TablePart(nHeader, Vector.empty, Vector.empty)
    val headerLines = (p.start until p.start + nHeader)
      .map(j => PandasCsv.splitLine(pandasLine(lines(j)), p.sep))
    // data rows: blank lines skipped (pandas skip_blank_lines=True), nrows cap
    val dataRaw = ArrayBuffer.empty[Vector[String]]
    var j = p.start + nHeader
    while (j < lines.length && dataRaw.size < nData) {
      val l = pandasLine(lines(j))
      if (l.nonEmpty) dataRaw += PandasCsv.splitLine(l, p.sep)
      j += 1
    }
    val ncols =
      if (nHeader > 0) headerLines.map(_.length).max
      else if (dataRaw.nonEmpty) dataRaw.head.length
      else 0
    val columns =
      if (nHeader > 0) PandasCsv.headerNames(headerLines, ncols)
      else (0 until ncols).map(c => Vector(c.toString)).toVector
    val cells = PandasCsv.convertRows(dataRaw.toSeq, ncols)
    TablePart(nHeader, columns, cells)
  }

  /** __describe_table (annotator.py:765-835). */
  def describeTable(tp: TablePart, aboutPrefix: String, dict: UnitDict): Vector[ColumnDesc] = {
    val gid = ColumnDesc(aboutPrefix + "-GID", "GID",
      Vector("GID", "Generic Identifier"), None, None)
    val cols = tp.columns.zipWithIndex.map { case (titles0, colIdx) =>
      val titlesList = titles0.map(t => PyStr.strip(t, "\""))
      val name = MakeId(titlesList.head)
      // last title wins; first matching part within a title wins
      var unit: Option[UnitHit] = None
      for (title <- titlesList) {
        var found: Option[UnitHit] = None
        var break = false
        for (part <- title.split(" ", -1) if !break) {
          dict.lookup(part) match {
            case Some(h) => found = Some(h); break = true
            case None =>
          }
        }
        unit = found
      }
      val n = math.min(20, tp.cells.length)
      val types = (0 until n).map(i => CellType.typeOf(tp.cells(i)(colIdx).render))
      val format =
        if (n > 0 && types.forall(_ == types.head))
          CellType.xsdOf(CellType.typeOf(tp.cells(0)(colIdx).render))
        else Some(CellType.XsdOf(CellType.TEXT))
      ColumnDesc(aboutPrefix + "-" + name, name, titlesList :+ name,
        unit.map(h => UnitRef(h.iri, h.rdfType)), format)
    }
    gid +: cols
  }

  // ------------------------------------------------------------ document

  /** Full per-document annotate() (annotator.py:374-380, 837-920).
    * `docId` plays the role of the document URL; namespace = docId + "/".
    */
  def annotate(docId: String, rawLines: IndexedSeq[String], encoding: String,
               dict: UnitDict): DocMeta = {
    val namespace = docId + "/"
    val parts = segment(rawLines)
    val notes = ArrayBuffer.empty[Note]
    val tables = ArrayBuffer.empty[TableDesc]
    parts.foreach { case (key, p) =>
      if (p.segType == "meta") {
        val params = metaPart(rawLines, p)
        if (params.nonEmpty)
          notes ++= serializeMeta(params, p.start, namespace, dict)
      } else {
        val tp = tablePart(rawLines, p)
        if (tp.cells.nonEmpty && tp.columns.nonEmpty) {
          val prefix = namespace + key
          tables += TableDesc(prefix, docId, p.sep, p.start, tp.headerRows,
            encoding, prefix + "-gid-{GID}", "GID",
            describeTable(tp, prefix, dict))
        }
      }
    }
    DocMeta(docId, namespace, encoding, notes.toVector, tables.toVector)
  }
}
