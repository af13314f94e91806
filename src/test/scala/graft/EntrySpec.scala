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
    assert(SparkEntry.queries.size >= 33)
  }

  test("dynamic oracles build once the sf dir is set (the Verify path)") {
    val _ = spark // the builders need SparkSession.active
    graft.queries.Queries.oracleSfDir = Some("/root/testdata/sf0.001")
    try {
      val m = SparkEntry.oracleSql
      assert(m.contains("q26_make_id") && m.contains("q27_ivf_kmeans"))
      assert(m("q26_make_id").contains("VALUES") && m("q27_ivf_kmeans").contains("VALUES"))
    } finally graft.queries.Queries.oracleSfDir = None
  }

  test("entry-point arg guards fail fast: stray positionals, single-file docs path") {
    // a single parquet FILE is not a valid readStream basePath — the
    // entry must say so instead of failing deep inside the source
    val f = java.nio.file.Files.createTempFile("docs", ".parquet")
    val ex = intercept[IllegalArgumentException] {
      RunCurateStream.main(Array(f.toString, "/tmp/out_nope"))
    }
    assert(ex.getMessage.contains("directory"), ex.getMessage)
    // a typo'd flag without leading dashes must error, not be swallowed
    intercept[IllegalArgumentException] {
      RunCurateStream.main(Array("/tmp/in", "/tmp/out", "id", "text", "stray"))
    }
    intercept[IllegalArgumentException] {
      RunCurate.main(Array("/tmp/in", "/tmp/out", "id", "text", "no-gopher"))
    }
  }

  test("--claim-* flags size the claim store without code changes") {
    val (cfg, rest) = RunCurateStream.parseClaimConfig(List(
      "--claim-fpp", "0.02", "--claim-chunk-fpp", "1e-5",
      "--claim-positives-cap", "5000", "--claim-fold-bytes", "1048576",
      "--claim-max-runs", "4", "--claim-expire-keep", "16",
      "--claim-shards", "8", "--min-words", "7"))
    assert(cfg.bloomFpp == 0.02 && cfg.chunkFpp == 1e-5)
    assert(cfg.positivesCap == 5000 && cfg.foldTargetBytes == 1048576L)
    assert(cfg.maxRuns == 4 && cfg.expireKeep == 16 && cfg.shards == 8)
    // non-claim flags pass through untouched for the curation parser
    assert(rest == List("--min-words", "7"))
    // no flags -> exact defaults
    val (dflt, _) = RunCurateStream.parseClaimConfig(Nil)
    assert(dflt == graft.streaming.ClaimStore.Config())
    // a flag missing its value fails fast
    intercept[IllegalArgumentException] {
      RunCurateStream.parseClaimConfig(List("--claim-shards"))
    }
  }
}
