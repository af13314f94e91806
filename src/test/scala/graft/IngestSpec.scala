package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{EncodingSniff, Fixtures, Ingest}

/** Raw-bytes ingest: binaryFile scan -> per-file encoding detection ->
  * spans (reference S1/S2, annotator.py:217-224 get_encoding +
  * :361-372 read_data).
  */
class IngestSpec extends AnyFunSuite {

  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  test("detection kernel reproduces the reference's chardet verdicts on all fixtures") {
    for (name <- Fixtures.Names) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/examples", name))
      assert(EncodingSniff.detect(bytes) == Fixtures.Encodings(name), name)
    }
  }

  test("detection kernel edge cases: BOMs, mojibake, binary") {
    import java.nio.charset.StandardCharsets._
    assert(EncodingSniff.detect("plain ascii,1,2\n".getBytes(US_ASCII)) == "utf-8")
    assert(EncodingSniff.detect("Kraft [N];Prüfzeit;Häufigkeit\n".getBytes(UTF_8)) == "utf-8")
    assert(EncodingSniff.detect("Kraft;Prüfzeit;Härte\n".getBytes(ISO_8859_1)) == "latin-1")
    // single multibyte char: chardet resolves ISO-8859-1 (the example5 case)
    assert(EncodingSniff.detect("Temp [°C];1;2\n".getBytes(UTF_8)) == "latin-1")
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "a,b\n".getBytes(UTF_8)
    assert(EncodingSniff.detect(bom) == "utf-8-sig")
    assert(EncodingSniff.decode(bom, "utf-8-sig") == "a,b\n")
    assert(EncodingSniff.detect(Array[Byte](0xFF.toByte, 0xFE.toByte, 65, 0)) == "utf-16")
    // arbitrary binary never throws: latin-1 decodes any byte sequence
    val junk = Array.tabulate[Byte](256)(_.toByte)
    assert(EncodingSniff.detect(junk) == "latin-1")
    assert(EncodingSniff.decode(junk, "latin-1").length == 256)
  }

  test("binaryFile + auto-detection reproduces every fixture doc and label") {
    val got = Ingest.fromCsvFilesDetected(spark,
        "/root/reference/examples/example*.csv").collect()
      .map { case (d, enc) => d.doc_id -> (d, enc) }.toMap
    assert(got.keySet == Fixtures.Names.toSet)
    for (name <- Fixtures.Names) {
      val (d, enc) = got(name)
      assert(enc == Fixtures.Encodings(name), name)
      val want = Fixtures.doc(name)
      assert(d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
        want.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)), name)
    }
  }

  test("triplesDetected over raw-bytes ingest == annotate path with pinned encodings") {
    val dict = Pipeline.broadcastDict(spark)
    val docs = Ingest.fromCsvFilesDetected(spark,
      "/root/reference/examples/example*.csv")
    val mine = Pipeline.triplesDetected(docs, dict).collect().toSet
    import spark.implicits._
    val want = Fixtures.Names.flatMap { name =>
      val d = Fixtures.doc(name)
      val lines = graft.ingest.SpanCodec.lines(d.spans)
      val meta = graft.annotate.Annotator.annotate(
        name, lines, Fixtures.Encodings(name), dict.value)
      graft.rdf.TripleExpand.expandDoc(meta, lines)
        .map(t => TripleRow(name, t.subj, t.pred, t.obj))
    }.toSet
    assert(mine == want)
  }
}
