package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ingest.Fixtures
import graft.rdf.{Canon, Serialize, Turtle}

class SerializeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("turtle sink round-trips through the turtle reader") {
    import spark.implicits._
    val dict = Pipeline.broadcastDict(spark)
    val docs = spark.createDataset(Seq(Fixtures.doc("example5.csv")))
    val ts = Pipeline.triples(docs, dict, _ => "latin-1")
    val dir = java.nio.file.Files.createTempDirectory("ttl").toString + "/g"
    Serialize.writeTurtle(ts, dir, partitions = 3)
    val text = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.endsWith(".txt")).sorted
      .map(p => new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
      .mkString("\n")
    val back = Turtle.parse(text)
    val orig = ts.collect().map(t => graft.rdf.Triple(t.subj, t.pred, t.obj)).toSeq
    val pr = Canon.compare(back, orig)
    assert(pr.precision == 1.0 && pr.recall == 1.0,
      s"p=${pr.precision} r=${pr.recall} missing=${pr.missing.take(3)} extra=${pr.extra.take(3)}")
  }
}
