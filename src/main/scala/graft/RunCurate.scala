package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry for the composite curation pass
  * ([[graft.ops.Curation]]): read a documents parquet table
  * (idCol, textCol), write the survivors table + the per-stage funnel,
  * print the funnel as one JSON line.
  *
  *   runMain graft.RunCurate <docsParquet> <outDir> [idCol] [textCol]
  *
  * Scale shape: the whole pass is one lazy plan (see Curation); the
  * survivors write is the only action besides the funnel aggregate.
  */
object RunCurate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunCurate <docsParquet> <outDir> [idCol] [textCol]")
    val (in, out) = (args(0), args(1))
    val idCol = if (args.length > 2) args(2) else "doc_id"
    val textCol = if (args.length > 3) args(3) else "text"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(in)
      val report = graft.ops.Curation.curationReport(docs, idCol, textCol)
        .localCheckpoint() // one evaluation feeds both the write and the funnel
      report.filter(org.apache.spark.sql.functions.col("keep"))
        .select(idCol, "text_curated")
        .write.mode("overwrite").parquet(s"$out/curated")
      val f = graft.ops.Curation.funnel(report).collect().head
      val json = s"""{"metric":"curate_funnel","n_docs":${f.getLong(0)},""" +
        s""""n_lang":${f.getLong(1)},"n_gopher":${f.getLong(2)},""" +
        s""""n_exact":${f.getLong(3)},"n_kept":${f.getLong(4)},"out":"$out/curated"}"""
      println(json)
    } finally spark.stop()
  }
}
