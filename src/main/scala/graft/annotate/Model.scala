package graft.annotate

/** Typed intermediate representation of one annotated document — the
  * engine's equivalent of the reference's CSVW JSON-LD metadata dict
  * (annotator.py:837-920). JSON-LD is a *rendering* of this (JsonLd.scala);
  * triples are an expansion of it (rdf/TripleExpand.scala).
  */
final case class UnitRef(iri: String, rdfType: String)

sealed trait Body
/** qudt:QuantityValue body; value rendered + tagged INT/FLOAT/BOOL/DATE. */
final case class QuantityBody(valueJson: String, xsdType: String,
                              unit: Option[UnitRef]) extends Body
/** oa:TextualBody */
final case class TextBody(value: String) extends Body
/** URI cell in a meta value — the reference's describe_value returns a
  * Python set here (unserializable; never exercised by fixtures,
  * annotator.py:311-312). We emit the bare URL string.
  */
final case class UriBody(url: String) extends Body

final case class Note(id: String, label: String, rownum: Int,
                      bodies: Vector[Body])

final case class ColumnDesc(id: String, name: String, titles: Vector[String],
                            unit: Option[UnitRef], formatIri: Option[String])

final case class TableDesc(id: String, url: String, delimiter: String,
                           skipRows: Int, headerRowCount: Int,
                           encoding: String, aboutUrl: String,
                           primaryKey: String, columns: Vector[ColumnDesc])

final case class DocMeta(id: String, namespace: String, encoding: String,
                         notes: Vector[Note], tables: Vector[TableDesc])

/** One classified segment (SURVEY.md §2.4 A1-A4). */
final case class Part(start: Int, end: Int, sep: String, count: Int,
                      segType: String, hasHeaderRow: Boolean)
