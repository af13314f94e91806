package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full KG-construction pipeline over the `documents`
    * table at sf0.001 — each document becomes a span-doc, is annotated
    * (segmentation, classification, schema inference, unit linking) and
    * expanded into triples. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dict = Pipeline.broadcastDict(spark)
    val docs = graft.ingest.Ingest.fromTextTable(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", idPrefix = "doc://")
    Pipeline.triples(docs, dict).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data ops); see graft.queries.Queries.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (name, fn, _) => name -> fn }.toMap

  /** DuckDB-runnable oracle SQL per query (omitted => rows-only check).
    * Oracle construction must never take down the whole dump: a query
    * whose SQL cannot be built (e.g. the q13 dictionary TTL is absent in
    * some environment) degrades to a rows-only check.
    */
  def oracleSql: Map[String, String] = {
    val static =
      Queries.registry.collect { case (name, _, Some(sql)) => name -> sql }.toMap
    val dynamic = for {
      (name, build) <- Queries.dynamicOracles
      dir <- Queries.oracleSfDir.toSeq
      sql <- scala.util.Try(build(SparkSession.active, dir)).toOption.toSeq
    } yield name -> sql
    static ++ dynamic
  }
}
