package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.annotate.Annotator
import graft.ingest.{Fixtures, SpanCodec, SynthCorpus}

/** The columnar (window) segmenter must produce exactly the per-doc
  * core's maximal runs on fixtures + synthetic docs.
  */
class SegmenterDFSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** reference runs computed with the scalar vote (pre-classification) */
  private def coreRuns(docId: String, lines: IndexedSeq[String]) = {
    val votes = lines.map(Annotator.vote)
    val runs = Vector.newBuilder[(String, Int, Int, String, Int)]
    var start = 0
    for (i <- 1 to votes.length) {
      if (i == votes.length || votes(i) != votes(start)) {
        val (sep, count) = votes(start)
        if (sep != null) runs += ((docId, start, i, sep, count))
        start = i
      }
    }
    runs.result()
  }

  test("window segmenter == core run-length on fixtures and synth docs") {
    import spark.implicits._
    val docs = Fixtures.Names.map(Fixtures.doc) ++ (0L until 48L).map(SynthCorpus.doc)
    val ds = spark.createDataset(docs)
    val got = graft.stage.SegmenterDF.segments(ds)
      .collect()
      .map(r => (r.getString(0), r.getInt(2), r.getInt(3), r.getString(4), r.getInt(5)))
      .toVector.sortBy(x => (x._1, x._2))
    val want = docs.flatMap(d => coreRuns(d.doc_id, SpanCodec.lines(d.spans)))
      .toVector.sortBy(x => (x._1, x._2))
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
  }
}
