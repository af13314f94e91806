package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ingest.SynthCorpus

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming pipeline == batch pipeline on the same docs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream").toString
    val docs = SynthCorpus.corpus(spark, 40)
    docs.write.parquet(s"$base/docs")
    val dict = Pipeline.broadcastDict(spark)
    val q = StreamingPipeline.start(spark, s"$base/docs", s"$base/out", s"$base/ckpt", dict)
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "subj", "pred", "obj").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).sorted
    val batch = Pipeline.triples(docs, dict).collect()
      .map(t => (t.doc_id, t.subj, t.pred, t.obj)).sorted
    assert(streamed.toVector == batch.toVector)
    assert(batch.nonEmpty)
  }
}
