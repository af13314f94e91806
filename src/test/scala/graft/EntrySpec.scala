package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class EntrySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry returns triples from the documents corpus") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet == Set("doc_id", "subj", "pred", "obj"))
    val n = df.count()
    info(s"entry triples: $n")
    assert(n > 0)
  }

  test("every registered query runs and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 25)
  }
}
