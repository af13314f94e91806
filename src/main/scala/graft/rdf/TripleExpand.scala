package graft.rdf

import graft.annotate._
import graft.csv.PandasCsv
import graft.csv.PandasCsv._
import graft.text.PyFloat
import scala.collection.mutable.ArrayBuffer

/** Per-document triple expansion (stage E): the RDF-graph equivalent of
  * the reference's JSON-LD metadata (rdflib JSON-LD expansion) plus the
  * full table-data expansion of `CSVWtoRDF.add_table_data`
  * (csvw_parser.py:249-343) and the PROV blocks (csvw_parser.py:378-421,
  * app.py:300-317). Blank nodes are skolemized deterministically.
  */
object TripleExpand {
  import Term._

  val RdfApiUrl = "http://localhost:5001/api/rdf"
  val RdfVersion = "v1.3.5"

  /** Stage-2 re-read of a table's cells from the document lines, mirroring
    * `parse_csv_from_url_to_list` (csvw_parser.py:46-95): skip
    * skipRows+headerRowCount lines, read to EOF (blank lines kept), first
    * ncols fields per row, per-column dtype inference over the whole read,
    * then truncate at the first all-NA row. GID = row index (prepended by
    * the caller as needed).
    */
  def stage2Rows(lines: IndexedSeq[String], t: TableDesc): Vector[Vector[PVal]] = {
    val skip = t.skipRows + t.headerRowCount
    val ncols = t.columns.length - 1
    if (skip >= lines.length || ncols <= 0) return Vector.empty
    val raw = (skip until lines.length).map { i =>
      PandasCsv.splitLine(pandasLine(lines(i)), t.delimiter)
    }
    val typed = PandasCsv.convertRows(raw, ncols)
    val firstBlank = typed.indexWhere(_.forall(_.isNaN))
    if (firstBlank >= 0) typed.take(firstBlank) else typed
  }

  private def pandasLine(l: String): String =
    l.stripSuffix("\n").stripSuffix("\r")

  private val XsdNumeric = Set(
    XsdNs + "float", XsdNs + "decimal", XsdNs + "integer", XsdNs + "double")

  /** rdflib Literal(python value) typing for qudt:value cells. */
  private def cellLiteral(v: PVal): String = v match {
    case PInt(x) => typed(x.toString, XsdNs + "integer")
    case PFloat(x) => typed(PyFloat.repr(x), XsdNs + "double")
    case PBool(b) => typed(if (b) "true" else "false", XsdNs + "boolean")
    case PNaN => typed("nan", XsdNs + "double")
    case PStr(s) => lit(s)
  }

  def expand(m: DocMeta, tableRows: Map[String, Vector[Vector[PVal]]],
             includeProv: Boolean = true): Vector[Triple] = {
    // rdflib Graph is a set. Cell-data triples are structurally unique by
    // construction (skolem ids embed row/col), so only the metadata/PROV
    // stream needs set semantics — a much smaller dedup than distinct()
    // over the full fan-out.
    val ts = ArrayBuffer.empty[Triple]
    val seen = scala.collection.mutable.HashSet.empty[Triple]
    var dedup = true
    def add(s: String, p: String, o: String): Unit = {
      val t = Triple(s, p, o)
      if (!dedup) ts += t
      else if (seen.add(t)) ts += t
    }
    val doc = iri(m.id)
    val metadataIri = {
      // reference: filename.rsplit('.', 1)[0] + "-metadata.json" — only
      // strip an extension that appears after the last path segment
      val slash = m.id.lastIndexOf('/')
      val dot = m.id.lastIndexOf('.')
      (if (dot > slash) m.id.substring(0, dot) else m.id) + "-metadata.json"
    }

    add(doc, RdfType, iri(CsvwNs + "TableGroup"))

    // ---- notes ----------------------------------------------------
    m.notes.foreach { n =>
      val note = iri(n.id)
      add(doc, iri(CsvwNs + "note"), note)
      add(note, RdfType, iri(OaNs + "Annotation"))
      add(note, RdfsLabel, lit(n.label))
      add(note, iri(CsvwNs + "rownum"), integer(n.rownum))
      n.bodies.zipWithIndex.foreach { case (b, bi) =>
        b match {
          case QuantityBody(vj, xsdT, unit) =>
            val bn = skolem(s"${m.id}|note|${n.id}|body|$bi")
            add(note, iri(OaNs + "hasBody"), bn)
            add(bn, RdfType, iri(QudtNs + "QuantityValue"))
            val lex =
              if (vj.startsWith("\"")) vj.substring(1, vj.length - 1) else vj
            add(bn, iri(QudtNs + "value"), typed(lex, xsdT))
            unit.foreach { u =>
              add(bn, iri(QudtNs + "unit"), iri(u.iri))
              add(iri(u.iri), RdfType, iri(u.rdfType))
            }
          case TextBody(v) =>
            val bn = skolem(s"${m.id}|note|${n.id}|body|$bi")
            add(note, iri(OaNs + "hasBody"), bn)
            add(bn, RdfType, iri(OaNs + "TextualBody"))
            add(bn, iri(OaNs + "purpose"), lit("oa:tagging"))
            add(bn, iri(OaNs + "format"), lit("text/plain"))
            add(bn, iri(OaNs + "value"), lit(v))
          case UriBody(url) =>
            add(note, iri(OaNs + "hasBody"), lit(url))
        }
      }
    }

    // ---- tables: metadata ----------------------------------------
    m.tables.foreach { t =>
      dedup = true // metadata/PROV stream needs set semantics per table
      val table = iri(t.id)
      add(doc, iri(CsvwNs + "table"), table)
      add(table, RdfType, iri(CsvwNs + "Table"))
      add(table, iri(CsvwNs + "url"), typed(t.url, XsdNs + "anyURI"))
      val dialect = skolem(s"${m.id}|table|${t.id}|dialect")
      add(table, iri(CsvwNs + "dialect"), dialect)
      add(dialect, iri(CsvwNs + "delimiter"), lit(t.delimiter))
      add(dialect, iri(CsvwNs + "skipRows"), nonNegInt(t.skipRows))
      add(dialect, iri(CsvwNs + "headerRowCount"), nonNegInt(t.headerRowCount))
      add(dialect, iri(CsvwNs + "encoding"), lit(t.encoding))
      val schema = skolem(s"${m.id}|table|${t.id}|schema")
      add(table, iri(CsvwNs + "tableSchema"), schema)
      add(schema, iri(CsvwNs + "aboutUrl"), typed(t.aboutUrl, CsvwNs + "uriTemplate"))
      add(schema, iri(CsvwNs + "primaryKey"), lit(t.primaryKey))
      // column RDF list
      val listNodes = t.columns.indices.map(i => skolem(s"${m.id}|table|${t.id}|collist|$i"))
      if (t.columns.nonEmpty) add(schema, iri(CsvwNs + "column"), listNodes.head)
      t.columns.zipWithIndex.foreach { case (c, i) =>
        add(listNodes(i), RdfFirst, iri(c.id))
        add(listNodes(i), RdfRest,
          if (i == t.columns.length - 1) RdfNil else listNodes(i + 1))
      }
      // columns
      t.columns.foreach { c =>
        val col = iri(c.id)
        add(col, RdfType, iri(CsvwNs + "Column"))
        add(col, iri(CsvwNs + "name"), lit(c.name))
        c.titles.foreach(tl => add(col, iri(CsvwNs + "title"), lit(tl)))
        if (c.name == "GID") {
          add(col, iri(CsvwNs + "datatype"), iri(XsdNs + "string"))
          add(col, iri(CsvwNs + "required"), boolean(true))
          add(col, iri(CsvwNs + "suppressOutput"), boolean(true))
        } else {
          c.formatIri.foreach(f => add(col, iri(CsvwNs + "format"), iri(f)))
          c.unit.foreach { u =>
            add(col, iri(QudtNs + "unit"), iri(u.iri))
            add(iri(u.iri), RdfType, iri(u.rdfType))
          }
        }
      }

      // ---- table data (csvw_parser.add_table_data) ----------------
      dedup = false // unique by construction (skolem ids embed row/col)
      val rows = tableRows.getOrElse(t.id, Vector.empty)
      val colMeta = t.columns // includes GID at 0
      rows.zipWithIndex.foreach { case (row, index) =>
        val rowNode = skolem(s"${m.id}|table|${t.id}|row|$index")
        val gidIri = iri(t.aboutUrl.replace("{GID}", index.toString))
        add(table, iri(CsvwNs + "row"), rowNode)
        add(rowNode, RdfType, iri(CsvwNs + "Row"))
        add(rowNode, iri(CsvwNs + "describes"), gidIri)
        val rowNum = index + t.skipRows + t.headerRowCount
        add(rowNode, iri(CsvwNs + "url"), iri(s"${t.url}/row=$rowNum"))
        // cells: reference iterates [gid] + cells against columns[cellIndex]
        row.zipWithIndex.foreach { case (cell0, j) =>
          val c = colMeta(j + 1) // shift: row has no GID column
          val format = c.formatIri.getOrElse(XsdNs + "string")
          val pred = iri(c.id)
          val cellPath = s"${m.id}|table|${t.id}|cell|$index|${j + 1}"
          // German float re-parse (csvw_parser.py:294-296)
          val cell = cell0 match {
            case PStr(s) if format == XsdNs + "double" =>
              val noDots = s.replace(".", "")
              val li = noDots.lastIndexOf(',')
              PStr(if (li < 0) noDots
                   else noDots.substring(0, li) + "." + noDots.substring(li + 1))
            case other => other
          }
          if (XsdNumeric.contains(format)) {
            val vn = skolem(s"$cellPath|qv")
            add(vn, RdfType, iri(QudtNs + "QuantityValue"))
            add(vn, iri(QudtNs + "value"), cellLiteral(cell))
            c.unit.foreach(u => add(vn, iri(QudtNs + "unit"), iri(u.iri)))
            add(gidIri, pred, vn)
          } else if (format == XsdNs + "anyURI") {
            cell match {
              case PStr(s) =>
                val uris = s.split(" ").toVector
                val nodes = uris.indices.map(k => skolem(s"$cellPath|list|$k"))
                uris.zipWithIndex.foreach { case (u, k) =>
                  add(nodes(k), RdfFirst, iri(u))
                  add(nodes(k), RdfRest,
                    if (k == uris.length - 1) RdfNil else nodes(k + 1))
                }
                add(gidIri, pred, nodes.head)
              case _ => // reference crashes on non-str anyURI cells; skip
            }
          } else {
            val vn = skolem(s"$cellPath|anno")
            val bn = skolem(s"$cellPath|body")
            add(vn, RdfType, iri(OaNs + "Annotation"))
            add(vn, iri(OaNs + "hasBody"), bn)
            add(bn, RdfType, iri(OaNs + "TextualBody"))
            add(bn, iri(DcNs + "format"), lit("text/plain"))
            add(bn, RdfValue, typed(cell.render, format))
            add(gidIri, pred, vn)
          }
        }
      }
    }

    // ---- PROV ----------------------------------------------------
    dedup = true
    if (includeProv) {
      // annotate-time block (metadata JSON-LD, app.py:300-317)
      val annApi = iri(JsonLd.AnnotateApiUrl)
      val annTag = iri(JsonLd.SourceRepo + "/releases/tag/" + JsonLd.AnnotateVersion)
      add(doc, iri(ProvNs + "wasGeneratedBy"), annApi)
      add(annApi, RdfType, iri(ProvNs + "Activity"))
      add(annApi, iri(ProvNs + "wasAssociatedWith"), annTag)
      add(annTag, RdfType, iri(ProvNs + "SoftwareAgent"))
      add(annTag, RdfsLabel, lit(JsonLd.AppName + JsonLd.AnnotateVersion))
      // JSON-LD string value -> plain literal (unlike the rdf-stage IRI)
      add(annTag, iri(ProvNs + "hadPrimarySource"), lit(JsonLd.SourceRepo))
      add(doc, iri(ProvNs + "generatedAtTime"),
        typed(JsonLd.GeneratedAtTime, XsdNs + "dateTime"))
      // rdf-stage block per table (csvw_parser.py:378-421)
      val rdfApi = iri(RdfApiUrl)
      val rdfTag = iri(JsonLd.SourceRepo + "/releases/tag/" + RdfVersion)
      m.tables.foreach { t =>
        val table = iri(t.id)
        add(table, iri(ProvNs + "wasGeneratedBy"), rdfApi)
        add(rdfApi, RdfType, iri(ProvNs + "Activity"))
        add(rdfApi, iri(ProvNs + "wasAssociatedWith"), rdfTag)
        add(rdfTag, RdfType, iri(ProvNs + "SoftwareAgent"))
        add(rdfTag, RdfsLabel, lit(JsonLd.AppName + RdfVersion))
        add(rdfTag, iri(ProvNs + "hadPrimarySource"), iri(JsonLd.SourceRepo))
        add(table, iri(ProvNs + "generatedAtTime"),
          typed(JsonLd.GeneratedAtTime, XsdNs + "dateTime"))
        add(iri(m.id), RdfType, iri(ProvNs + "Usage"))
        add(iri(m.id), iri(ProvNs + "hadRole"), iri(CsvwNs + "csvEncodedTabularData"))
        add(table, iri(ProvNs + "qualifiedUsage"), iri(m.id))
        add(iri(metadataIri), RdfType, iri(ProvNs + "Usage"))
        add(iri(metadataIri), iri(ProvNs + "hadRole"), iri(CsvwNs + "tabularMetadata"))
        add(table, iri(ProvNs + "qualifiedUsage"), iri(metadataIri))
      }
    }
    ts.toVector
  }

  /** Convenience: full per-doc pipeline meta -> triples. */
  def expandDoc(m: DocMeta, lines: IndexedSeq[String],
                includeProv: Boolean = true): Vector[Triple] = {
    val rows = m.tables.map(t => t.id -> stage2Rows(lines, t)).toMap
    expand(m, rows, includeProv)
  }
}
