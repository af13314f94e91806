package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.annotate.Annotator
import graft.ingest.{Fixtures, SpanCodec, SynthCorpus}

/** The pure-Catalyst HOF segmenter must equal the scalar core. */
class SegmenterExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def coreRuns(lines: IndexedSeq[String]) = {
    val votes = lines.map(Annotator.vote)
    val runs = Vector.newBuilder[(Int, Int, String, Int)]
    var start = 0
    for (i <- 1 to votes.length) {
      if (i == votes.length || votes(i) != votes(start)) {
        val (sep, count) = votes(start)
        if (sep != null) runs += ((start, i, sep, count))
        start = i
      }
    }
    runs.result()
  }

  test("expression segmenter == core on fixtures + synth docs") {
    import spark.implicits._
    val docs = Fixtures.Names.map(Fixtures.doc) ++ (0L until 64L).map(SynthCorpus.doc)
    val ds = spark.createDataset(docs)
    val rows = ds.select(col("doc_id"),
        graft.stage.SegmenterExpr.segmentsCol("spans").as("segs"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getInt(1), x.getString(2), x.getInt(3))).toVector)
      .toMap
    docs.foreach { d =>
      val want = coreRuns(SpanCodec.lines(d.spans))
      assert(rows(d.doc_id) == want, d.doc_id)
    }
  }

  test("expression segmenter plan is a single narrow projection") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(SynthCorpus.doc(1)))
    val plan = ds.select(graft.stage.SegmenterExpr.segmentsCol("spans"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
