package graft.annotate

import graft.json._

/** Renders a DocMeta to the reference's CSVW JSON-LD metadata document
  * shape (annotator.py:837-920, app.py:300-317), key order included.
  */
object JsonLd {

  val CsvwContext = "http://www.w3.org/ns/csvw"
  val TableGroupType = "http://www.w3.org/ns/csvw#TableGroup"
  val Oa = "http://www.w3.org/ns/oa#"
  val Xsd = "http://www.w3.org/2001/XMLSchema#"
  val Qudt = "http://qudt.org/schema/qudt/"
  val Dc = "http://purl.org/dc/elements/1.1/"
  val Prov = "http://www.w3.org/ns/prov#"
  val RdfsLabel = "http://www.w3.org/2000/01/rdf-schema#label"

  /** PROV constants mirroring the reference deployment that produced the
    * goldens (stripped by comparators; versions from settings.py).
    */
  val AnnotateApiUrl = "http://localhost:5001/api/annotate"
  val AnnotateVersion = "v1.2.8"
  val AppName = "CSVtoCSVW"
  val SourceRepo = "https://github.com/Mat-O-Lab/CSVToCSVW"
  val GeneratedAtTime = "2024-01-01T00:00:00.000000"

  def context(namespace: String): JValue = JArr.of(
    JStr(CsvwContext),
    JObj.of(
      "oa" -> JStr(Oa),
      "label" -> JStr(RdfsLabel),
      "xsd" -> JStr(Xsd),
      "qudt" -> JStr(Qudt),
      "dc" -> JStr(Dc),
      "prov" -> JStr(Prov),
      "csv" -> JStr(namespace)))

  private def unitJson(u: UnitRef): JValue =
    JObj.of("@id" -> JStr(u.iri), "@type" -> JStr(u.rdfType))

  def bodyJson(b: Body): JValue = b match {
    case QuantityBody(v, t, unit) =>
      val value = JObj.of(
        "@value" -> (if (v.startsWith("\"")) JStr(v.substring(1, v.length - 1))
                     else if (v == "true" || v == "false") JBool(v == "true")
                     else JNum(v)),
        "@type" -> JStr(t))
      val base = Vector[(String, JValue)]("@type" -> JStr("qudt:QuantityValue"), "qudt:value" -> value)
      JObj(unit.fold(base)(u => base :+ ("qudt:unit" -> unitJson(u))))
    case TextBody(v) =>
      JObj.of(
        "@type" -> JStr("oa:TextualBody"),
        "oa:purpose" -> JStr("oa:tagging"),
        "oa:format" -> JStr("text/plain"),
        "oa:value" -> JStr(v))
    case UriBody(url) => JStr(url)
  }

  def noteJson(n: Note): JValue = JObj.of(
    "@id" -> JStr(n.id),
    "label" -> JStr(n.label),
    "@type" -> JStr("oa:Annotation"),
    "rownum" -> JObj.of("@value" -> Json.num(n.rownum), "@type" -> JStr("xsd:integer")),
    "oa:hasBody" -> JArr(n.bodies.map(bodyJson)))

  def columnJson(c: ColumnDesc): JValue =
    if (c.name == "GID")
      JObj.of(
        "@id" -> JStr(c.id),
        "name" -> JStr("GID"),
        "titles" -> JArr(c.titles.map(JStr)),
        "datatype" -> JStr("string"),
        "required" -> JBool(true),
        "suppressOutput" -> JBool(true),
        "@type" -> JStr("Column"))
    else {
      val base = Vector[(String, JValue)](
        "titles" -> JArr(c.titles.map(s => JStr(s))),
        "@id" -> JStr(c.id),
        "name" -> JStr(c.name))
      val withUnit = c.unit.fold(base)(u => base :+ ("qudt:unit" -> unitJson(u)))
      JObj(withUnit ++ Vector(
        "@type" -> JArr.of(JStr("Column")),
        "format" -> JObj.of("@id" -> c.formatIri.fold[JValue](JNull)(JStr))))
    }

  def tableJson(t: TableDesc): JValue = JObj.of(
    "@id" -> JStr(t.id),
    "url" -> JStr(t.url),
    "dialect" -> JObj.of(
      "delimiter" -> JStr(t.delimiter),
      "skipRows" -> Json.num(t.skipRows),
      "headerRowCount" -> Json.num(t.headerRowCount),
      "encoding" -> JStr(t.encoding)),
    "tableSchema" -> JObj.of(
      "columns" -> JArr(t.columns.map(columnJson)),
      "primaryKey" -> JStr(t.primaryKey),
      "aboutUrl" -> JStr(t.aboutUrl)))

  def provJson: Vector[(String, JValue)] = Vector(
    "prov:wasGeneratedBy" -> JObj.of(
      "@id" -> JStr(AnnotateApiUrl),
      "@type" -> JStr("prov:Activity"),
      "prov:wasAssociatedWith" -> JObj.of(
        "@id" -> JStr(SourceRepo + "/releases/tag/" + AnnotateVersion),
        "rdfs:label" -> JStr(AppName + AnnotateVersion),
        "prov:hadPrimarySource" -> JStr(SourceRepo),
        "@type" -> JStr("prov:SoftwareAgent"))),
    "prov:generatedAtTime" -> JObj.of(
      "@value" -> JStr(GeneratedAtTime),
      "@type" -> JStr("xsd:dateTime")))

  /** Full metadata document (with PROV like app.py's annotate). */
  def render(m: DocMeta): JObj = JObj(Vector(
    "@context" -> context(m.namespace),
    "@id" -> JStr(m.id),
    "@type" -> JStr(TableGroupType),
    "notes" -> JArr(m.notes.map(noteJson)),
    "tables" -> JArr(m.tables.map(tableJson))) ++ provJson)
}
