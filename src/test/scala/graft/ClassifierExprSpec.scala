package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.annotate.Annotator
import graft.ingest.{Fixtures, SpanCodec, SynthCorpus}

/** Stages B+C as one Catalyst expression must reproduce the scalar core
  * exactly: keys, boundaries, separators and classifications.
  */
class ClassifierExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.expr.CellTypeOf.register(s)
    s
  }

  test("expression classifier == core segment() on fixtures + synth docs") {
    import spark.implicits._
    val docs = Fixtures.Names.map(Fixtures.doc) ++ (0L until 64L).map(SynthCorpus.doc)
    val ds = spark.createDataset(docs)
    val got = ds.select($"doc_id", graft.stage.ClassifierExpr.partsCol("spans").as("parts"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getString(0), x.getInt(1), x.getInt(2), x.getString(3), x.getInt(4), x.getString(5))).toVector)
      .toMap
    docs.foreach { d =>
      val want = Annotator.segment(SpanCodec.lines(d.spans)).map { case (key, p) =>
        (key, p.start, p.end, p.sep, p.count, p.segType)
      }
      assert(got(d.doc_id) == want, d.doc_id)
    }
  }
}
