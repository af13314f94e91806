package graft.annotate

import graft.json._

/** CSVW JSON-LD metadata *reader* — the input half of the reference's
  * `/api/rdf` entry point (csvw_parser.py:166-247 `CSVWtoRDF.__init__`):
  * parses a `*-metadata.json` document (the engine's own output, the
  * reference's, or a hand-edited one) into the typed [[DocMeta]] IR so
  * the existing [[graft.rdf.TripleExpand]] can expand it against the CSV
  * without re-running stages B–D.
  *
  * Column order: in the compact JSON-LD form `tableSchema.columns` is a
  * JSON array (the CSVW @context maps csvw:column to an @list
  * container), so array order IS the RDF-list order the reference
  * recovers via `rdflib.collection.Collection`
  * (csvw_parser.py:27-43 `get_columns_from_schema`).
  *
  * The reader is tolerant of the small shape variations CSVW allows:
  * single values where the engine writes one-element arrays, bare
  * numbers where it writes `{"@value": n, "@type": ...}`, prefixed or
  * full datatype IRIs.
  */
object CsvwReader {

  private val Prefixes = Map(
    "xsd" -> JsonLd.Xsd, "qudt" -> JsonLd.Qudt, "oa" -> JsonLd.Oa,
    "dc" -> JsonLd.Dc, "prov" -> JsonLd.Prov)

  def read(jsonText: String): DocMeta = fromJson(Json.parse(jsonText) match {
    case o: JObj => o
    case other => throw new IllegalArgumentException(s"metadata root is not an object: $other")
  })

  def fromJson(root: JObj): DocMeta = {
    val ctx = contextMap(root.get("@context"))
    def expand(s: String): String = {
      val i = s.indexOf(':')
      if (i > 0 && !s.startsWith("http") && !s.startsWith("file:")) {
        val p = s.substring(0, i)
        ctx.get(p).orElse(Prefixes.get(p)).map(_ + s.substring(i + 1)).getOrElse(s)
      } else s
    }
    val id = str(root("@id"))
    val namespace = ctx.getOrElse("csv", id + "/")
    val notes = arr(root.get("notes")).collect { case o: JObj => note(o, expand) }
    val tables = arr(root.get("tables")).collect { case o: JObj => table(o, expand) }
    val encoding = tables.headOption.map(_.encoding).getOrElse("utf-8")
    DocMeta(id, namespace, encoding, notes, tables)
  }

  // ------------------------------------------------------------- pieces

  private def contextMap(v: Option[JValue]): Map[String, String] = v match {
    case Some(JArr(items)) =>
      items.collect { case JObj(fs) =>
        fs.collect { case (k, JStr(s)) => k -> s }
      }.flatten.toMap
    case Some(JObj(fs)) => fs.collect { case (k, JStr(s)) => k -> s }.toMap
    case _ => Map.empty
  }

  private def note(o: JObj, expand: String => String): Note = {
    val bodies = (o.get("oa:hasBody") match {
      case Some(JArr(items)) => items
      case Some(single) => Vector(single)
      case None => Vector.empty
    }).map(body(_, expand))
    Note(str(o("@id")), str(o("label")), intOf(o.get("rownum")), bodies)
  }

  private def body(v: JValue, expand: String => String): Body = v match {
    case JStr(url) => UriBody(url)
    case o: JObj =>
      val tpe = str(o("@type"))
      if (tpe == "qudt:QuantityValue" || expand(tpe) == JsonLd.Qudt + "QuantityValue") {
        val (lex, vtype) = o.get("qudt:value") match {
          case Some(inner: JObj) =>
            (valueJsonOf(inner("@value")), expand(strOr(inner.get("@type"), "xsd:string")))
          case Some(other) => (valueJsonOf(other), JsonLd.Xsd + "string")
          case None => ("\"\"", JsonLd.Xsd + "string")
        }
        QuantityBody(lex, vtype, unitRef(o.get("qudt:unit")))
      } else TextBody(strOr(o.get("oa:value"), ""))
    case other =>
      throw new IllegalArgumentException(s"unsupported body: $other")
  }

  /** Reconstructs QuantityBody.valueJson exactly as the annotator stores
    * it: numeric literals verbatim, strings quoted, bools bare.
    */
  private def valueJsonOf(v: JValue): String = v match {
    case JNum(l) => l
    case JStr(s) => "\"" + s + "\""
    case JBool(b) => if (b) "true" else "false"
    case JNull => "\"\""
    case other => throw new IllegalArgumentException(s"unsupported @value: $other")
  }

  private def unitRef(v: Option[JValue]): Option[UnitRef] = v match {
    case Some(o: JObj) => Some(UnitRef(str(o("@id")), str(o("@type"))))
    case _ => None
  }

  private def table(o: JObj, expand: String => String): TableDesc = {
    val dialect = o.get("dialect").collect { case d: JObj => d }.getOrElse(JObj(Vector.empty))
    val schema = o.get("tableSchema").collect { case s: JObj => s }.getOrElse(JObj(Vector.empty))
    val columns = arr(schema.get("columns")).collect { case c: JObj => column(c, expand) }
    TableDesc(
      id = str(o("@id")),
      url = str(o("url")),
      delimiter = strOr(dialect.get("delimiter"), ","),
      skipRows = intOf(dialect.get("skipRows")),
      headerRowCount = dialect.get("headerRowCount").fold(1)(v => intOf(Some(v))),
      encoding = strOr(dialect.get("encoding"), "utf-8"),
      aboutUrl = strOr(schema.get("aboutUrl"), ""),
      primaryKey = strOr(schema.get("primaryKey"), "GID"),
      columns = columns)
  }

  private def column(o: JObj, expand: String => String): ColumnDesc = {
    val titles = o.get("titles") match {
      case Some(JArr(items)) => items.collect { case JStr(s) => s }
      case Some(JStr(s)) => Vector(s)
      case _ => Vector.empty
    }
    val name = str(o("name"))
    val formatIri = o.get("format").flatMap {
      case f: JObj => f.get("@id").collect { case JStr(s) => expand(s) }
      case JStr(s) => Some(expand(s))
      case _ => None
    }
    ColumnDesc(str(o("@id")), name, titles, unitRef(o.get("qudt:unit")),
      if (name == "GID") None else formatIri)
  }

  // ------------------------------------------------------------ helpers

  private def arr(v: Option[JValue]): Vector[JValue] = v match {
    case Some(JArr(items)) => items
    case Some(other) => Vector(other)
    case None => Vector.empty
  }

  private def str(v: JValue): String = v match {
    case JStr(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }

  private def strOr(v: Option[JValue], dflt: String): String = v match {
    case Some(JStr(s)) => s
    case _ => dflt
  }

  private def intOf(v: Option[JValue]): Int = v match {
    case Some(JNum(l)) => l.toDouble.toInt
    case Some(o: JObj) => intOf(o.get("@value"))
    case _ => 0
  }
}
