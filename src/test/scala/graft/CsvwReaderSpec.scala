package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.annotate.{Annotator, CsvwReader, JsonLd}
import graft.ingest.{Fixtures, SpanCodec}
import graft.link.UnitDict
import graft.rdf._

/** The `/api/rdf` input half: CSVW JSON-LD metadata -> DocMeta ->
  * TripleExpand, without running stages B-D.
  */
class CsvwReaderSpec extends AnyFunSuite {

  private lazy val dict = UnitDict.default
  private val Base = "https://github.com/Mat-O-Lab/CSVToCSVW/raw/main/examples/"

  test("reader inverts the renderer on all fixtures (DocMeta round-trip)") {
    for (name <- Fixtures.Names) {
      val text = Fixtures.text(name)
      val docId = Base + name
      val lines = SpanCodec.lines(SpanCodec.encode(docId, text).spans)
      val meta = Annotator.annotate(docId, lines, Fixtures.Encodings(name), dict)
      val back = CsvwReader.read(JsonLd.render(meta).render)
      assert(back == meta, name)
    }
  }

  /** Numeric-rendering-insensitive DocMeta comparison: the reference
    * emits Python ints where the engine keeps the float rendering
    * (golden `150` vs engine `150.0`, same xsd:double literal value) —
    * the same normalization ShippedGoldenSpec applies at the JSON level.
    */
  private def numNorm(m: graft.annotate.DocMeta): graft.annotate.DocMeta =
    m.copy(notes = m.notes.map(n => n.copy(bodies = n.bodies.map {
      case graft.annotate.QuantityBody(v, t, u) if !v.startsWith("\"") &&
          v != "true" && v != "false" =>
        graft.annotate.QuantityBody(
          BigDecimal(v).bigDecimal.stripTrailingZeros.toPlainString, t, u)
      case other => other
    })))

  for (name <- Seq("example.csv", "example2.csv", "example5.csv")) {
    test(s"$name: shipped golden metadata JSON parses to the annotate-time DocMeta") {
      val goldenJson = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(
          s"/root/reference/examples/${name.stripSuffix(".csv")}-metadata.json")), "UTF-8")
      val fromGolden = CsvwReader.read(goldenJson)
      val text = Fixtures.text(name)
      val lines = SpanCodec.lines(SpanCodec.encode(Base + name, text).spans)
      val mine = Annotator.annotate(Base + name, lines, Fixtures.Encodings(name), dict)
      assert(numNorm(fromGolden) == numNorm(mine))
    }
  }

  for (name <- Seq("example2.csv", "example5.csv")) {
    test(s"$name: golden metadata -> reader -> expand == golden TTL (P=R>=0.95)") {
      val goldenJson = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(
          s"/root/reference/examples/${name.stripSuffix(".csv")}-metadata.json")), "UTF-8")
      val meta = CsvwReader.read(goldenJson)
      val lines = SpanCodec.lines(
        SpanCodec.encode(Base + name, Fixtures.text(name)).spans)
      val mine = TripleExpand.expandDoc(meta, lines)
      val golden = Turtle.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(
          s"/root/reference/examples/${name.stripSuffix(".csv")}.ttl")), "UTF-8"))
      val pr = Canon.compare(mine, golden)
      info(f"precision=${pr.precision}%.4f recall=${pr.recall}%.4f")
      assert(pr.precision >= 0.95 && pr.recall >= 0.95)
    }
  }

  test("Pipeline.triplesFromMetadata == per-doc expandDoc (distributed path)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val rows = Seq("example2.csv", "example5.csv").map { name =>
      val text = Fixtures.text(name)
      val docId = Base + name
      val lines = SpanCodec.lines(SpanCodec.encode(docId, text).spans)
      val meta = Annotator.annotate(docId, lines, Fixtures.Encodings(name), dict)
      (JsonLd.render(meta).render, text)
    }
    val out = Pipeline.triplesFromMetadata(spark.createDataset(rows)).collect()
    val want = Seq("example2.csv", "example5.csv").flatMap { name =>
      val text = Fixtures.text(name)
      val docId = Base + name
      val lines = SpanCodec.lines(SpanCodec.encode(docId, text).spans)
      val meta = Annotator.annotate(docId, lines, Fixtures.Encodings(name), dict)
      TripleExpand.expandDoc(meta, lines)
        .map(t => TripleRow(docId, t.subj, t.pred, t.obj))
    }
    assert(out.toSet == want.toSet)
    assert(out.length == want.length)
  }
}
