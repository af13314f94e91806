package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registry query on SPARK_GRAFT_SF_DIR plus
  * the KG pipeline on a synthetic corpus; ONE JSON line on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // Same-window CONTROL probe: a fixed pure-CPU workload (the
    // CoreProbe kernel — annotate + expand synthetic docs on plain
    // threads, no Spark) run before and after the battery. Host
    // contention that inflates the battery inflates this identically,
    // so a reader can normalize any artifact against its own control
    // instead of guessing whether a slow number was code or host.
    def controlProbe(threads: Int = 8, docs: Long = 4000): Double = {
      val dictCore = graft.link.UnitDict.default
      val next = new java.util.concurrent.atomic.AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = next.getAndIncrement()
          while (i < docs) {
            val d = graft.ingest.SynthCorpus.doc(i)
            val lines = graft.ingest.SpanCodec.lines(d.spans)
            val m = graft.annotate.Annotator.annotate(d.doc_id, lines, "utf-8", dictCore)
            graft.rdf.TripleExpand.expandDoc(m, lines)
            i = next.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      docs / ((System.nanoTime() - t0) / 1e9)
    }
    // A single probe ramps with C2 compilation for thousands of docs
    // (a 500-doc-warmup pre read 2.8x below post — compilation, not
    // host noise), so each reported control is the MAX over repeated
    // probes until two consecutive runs agree within 10% (cap 6): the
    // steady-state rate, robust to both JIT ramp and a stray GC pause.
    def controlSteady(): Double = {
      var best = 0.0; var last = -1.0; var i = 0
      var settled = false
      while (i < 6 && !settled) {
        val r = controlProbe()
        // settle on two consecutive RUN values agreeing (a run dipping
        // below the max — a GC pause mid-ramp — must not end the loop)
        settled = last > 0 && math.abs(r - last) <= 0.10 * math.max(r, last)
        last = r
        if (r > best) best = r
        i += 1
      }
      best
    }

    // JVM/codegen warmup on a cheap query
    try SparkEntry.queries.head._2(spark, sfDir).count() catch { case _: Throwable => }

    // interleaved reps, per-query MIN — the BENCH.md measurement
    // protocol (this host's contention windows can inflate any single
    // shot up to ~3x; interleaving spreads them across all queries
    // instead of penalizing whichever one they landed on)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // min-of-reps that never lets a failed rep (-1) clobber a valid
    // earlier measurement
    def record(name: String, t: Double): Unit =
      results(name) = results.get(name).filter(_ >= 0)
        .map(p => if (t >= 0) math.min(p, t) else p).getOrElse(t)

    val nDocs = sys.env.getOrElse("SPARK_GRAFT_PIPE_DOCS", "20000").toLong
    val dict = Pipeline.broadcastDict(spark)
    val controlPre = controlSteady()
    for (_ <- 1 to reps) {
      graft.queries.Queries.registry.foreach { case (name, fn, _) =>
        val t =
          try { val d = time(fn(spark, sfDir).write.mode("overwrite").format("noop").save()); d }
          catch { case _: Throwable => -1.0 }
        record(name, t)
      }
      // the KG-pipeline headline runs INSIDE the interleaved-reps loop so
      // it gets the same min-of-reps de-noising as every query
      val tp =
        try time {
          Pipeline.triples(graft.ingest.SynthCorpus.corpus(spark, nDocs), dict)
            .write.mode("overwrite").format("noop").save()
        } catch { case _: Throwable => -1.0 }
      record("pipeline_synth", tp)
    }

    val controlPost = controlSteady()
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_docs":$nDocs,"cpus":"$cpus","reps":$reps,"rep_stat":"min","control_docs_per_sec_pre":$controlPre%.0f,"control_docs_per_sec_post":$controlPost%.0f,"control_threads":8,"control_docs":4000}"""
    // stdout (bare — build.sbt routes forked run output unprefixed) AND a
    // file, so the driver can machine-read it either way.
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
