package graft

import graft.ingest.{Doc, Fixtures, SpanCodec, SynthCorpus}
import org.apache.spark.sql.{Dataset, SparkSession}

/** spark-submit entry: run the KG pipeline end-to-end.
  *
  *   runMain graft.RunPipeline <fixtures|synth:N> <outDir> [--resume] [--compact]
  *
  * Writes: <outDir>/metadata (parquet), <outDir>/triples (parquet,
  * pred-bucket partitioned), <outDir>/ntriples (sorted text),
  * <outDir>/metrics (a [[graft.table.SnapTable]] — read with
  * `SnapTable.read`; atomic watermarked commits per run).
  */
object RunPipeline {

  def session(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-kg")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("fixtures")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_out"
    val resume = args.contains("--resume")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dict = Pipeline.broadcastDict(spark)
    val (docs0, encodingOf): (Dataset[Doc], String => String) = what match {
      case s if s.startsWith("synth:") =>
        (SynthCorpus.corpus(spark, s.drop(6).toLong), (_: String) => "utf-8")
      case _ =>
        val ds = spark.createDataset(Fixtures.Names.map(Fixtures.doc))
        (ds, (id: String) => Fixtures.Encodings.getOrElse(id, "utf-8"))
    }
    val docs = if (resume) Pipeline.resumeFilter(docs0, spark, s"$outDir/triples") else docs0

    val bad = Pipeline.spanInvariantViolations(docs)
    require(bad == 0, s"span invariant violated by $bad docs")
    val t0 = System.nanoTime()
    def lap(label: String, t: Long): Long = {
      val now = System.nanoTime()
      println(f"[pipeline] $label: ${(now - t) / 1e9}%.1f s")
      now
    }
    var tl = t0
    Pipeline.metadata(docs, dict, encodingOf)
      .write.mode(if (resume) "append" else "overwrite")
      .parquet(s"$outDir/metadata")
    tl = lap("metadata", tl)
    val ts = Pipeline.triples(docs, dict, encodingOf)
    Pipeline.writeTriples(ts, outDir + "/triples",
      if (resume) org.apache.spark.sql.SaveMode.Append else org.apache.spark.sql.SaveMode.Overwrite)
    // snapshot commit: record completed doc_ids (tiny) so a later
    // --resume anti-joins the sidecar, not the triple table; a fresh
    // (non-resume) run must not inherit stale commits
    Pipeline.commitDocIds(docs, outDir + "/triples",
      if (resume) org.apache.spark.sql.SaveMode.Append
      else org.apache.spark.sql.SaveMode.Overwrite)
    tl = lap("triples-table", tl)
    if (args.contains("--compact")) { // fold small append/micro-batch files
      Pipeline.compactTriples(spark, s"$outDir/triples")
      Pipeline.compactCommits(spark, s"$outDir/triples")
      tl = lap("compact", tl)
    }
    val tsOut = spark.read.parquet(s"$outDir/triples")
    // metrics commit through the snapshot layer: atomic, watermarked by
    // run id, snapshot-readable (SnapTable.read(outDir + "/metrics"))
    Pipeline.writeMetricsSnap(
      Pipeline.metrics(tsOut.select($"doc_id", $"subj", $"pred", $"obj").as[TripleRow],
        runId = what, stage = "materialize"),
      s"$outDir/metrics", watermark = Some(what))
    tl = lap("metrics", tl)
    Pipeline.writeSortedNTriples(
      tsOut.select($"doc_id", $"subj", $"pred", $"obj").as[TripleRow], s"$outDir/ntriples")
    tl = lap("ntriples-sorted", tl)
    val secs = (System.nanoTime() - t0) / 1e9
    val nDocs = spark.read.parquet(s"$outDir/metadata").count()
    val nTriples = tsOut.count()
    println(f"[pipeline] docs=$nDocs triples=$nTriples in $secs%.1f s " +
      f"(${nDocs / secs}%.1f docs/s)")
    spark.stop()
  }
}
