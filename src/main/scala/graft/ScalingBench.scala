package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE north rule): the same pipeline
  * job at two parallelism levels — local[8] vs local[32] as the sandbox
  * proxy for N vs 4N executors — on the identical deterministic corpus.
  * Reports docs/sec at both, efficiency = (T8/T32)/4, and verifies the
  * outputs are identical (xor-hash) — determinism under parallelism.
  *
  *   runMain graft.ScalingBench [nDocs]
  */
object ScalingBench {

  def run(cpus: Int, nDocs: Long): (Double, Long, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scale-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    try {
      val dict = Pipeline.broadcastDict(spark)
      // fixed task granularity: same split count at both parallelism
      // levels (4 tasks per core at the larger size) so the comparison
      // varies only the executor-thread count, like adding executors
      val parts = 128
      val t0 = System.nanoTime()
      val ts = Pipeline.triples(graft.ingest.SynthCorpus.corpus(spark, nDocs, parts), dict)
      val agg = ts.select(xxhash64(col("doc_id"), col("subj"), col("pred"), col("obj")).as("h"))
        .agg(expr("bit_xor(h)").as("x"), count(lit(1)).as("n")).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, agg.getLong(0), agg.getLong(1))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong)
      .orElse(sys.env.get("SPARK_GRAFT_SCALE_DOCS").map(_.toLong))
      .getOrElse(200000L)
    // warmup JVM+codegen once at small size
    run(8, 2000)
    val (t8, h8, n8) = run(8, nDocs)
    val (t32, h32, n32) = run(32, nDocs)
    val eff = (t8 / t32) / 4.0
    val identical = h8 == h32 && n8 == n32
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","docs":$nDocs,"t_local8_sec":$t8%.1f,"t_local32_sec":$t32%.1f,"docs_per_sec_8":${nDocs / t8}%.1f,"docs_per_sec_32":${nDocs / t32}%.1f,"triples":$n8,"identical_output":$identical}""")
  }
}
