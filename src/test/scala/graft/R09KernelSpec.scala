package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** r9 optimization round: every narrow kernel that replaced an exploded/
  * shuffled formulation is pinned bit-equal to that formulation here —
  * the "focused test when an optimization changes an operator's
  * internals" requirement.
  */
class R09KernelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Real corpus + adversarial token edges (empties, runs of whitespace,
    * unicode, single tokens, duplicate-heavy docs).
    */
  private def corpus: DataFrame = {
    import spark.implicits._
    val edges = Seq(
      (100001L, ""), (100002L, " "), (100003L, "a"), (100004L, "a b"),
      (100005L, "a  b\tc"), (100006L, "Ä ß x Ä ß x Ä ß x"),
      (100007L, "x y z x y z x y z x y z"), (100008L, " lead and trail "),
      (100009L, "émile zola émile zola café"), (100010L, "one"))
      .toDF("doc_id", "text")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).unionByName(edges)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    val av = a.collect().map(_.toString).sorted
    val bv = b.collect().map(_.toString).sorted
    assert(av.length == bv.length, s"$hint: ${av.length} vs ${bv.length} rows")
    av.zip(bv).foreach { case (x, y) => assert(x == y, s"$hint: $x != $y") }
  }

  test("graft_minhash_md5 narrow kernel == exploded min(md5(j:shingle)) aggregation") {
    val d = corpus
    assertSameRows(
      Dedup.minhashSignatures(d, "doc_id", "text", k = 8, shingleN = 3),
      Dedup.minhashSignaturesAgg(d, "doc_id", "text", k = 8, shingleN = 3),
      "minhash md5 k=8 n=3")
    assertSameRows(
      Dedup.minhashSignatures(d, "doc_id", "text", k = 3, shingleN = 5),
      Dedup.minhashSignaturesAgg(d, "doc_id", "text", k = 3, shingleN = 5),
      "minhash md5 k=3 n=5")
    // narrow: no explode, no shuffle
    val p = Dedup.minhashSignatures(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Generate"), p.take(1200))
  }

  test("graft_simhash_md5 narrow kernel == exploded md5 nibble-vote aggregation") {
    def agg(d: DataFrame, width: Int): DataFrame = {
      // the pre-r9 q17 formulation, verbatim
      val toks = d.select(col("doc_id"),
          explode(expr("array_distinct(split(text, '\\\\s+'))")).as("tok"))
        .withColumn("h", md5(col("tok")))
      def vote(bit: Int) = {
        val nib = bit / 4; val shift = 1 << (3 - bit % 4)
        expr(s"""case when ((cast(conv(substring(h, ${nib + 1}, 1), 16, 10) as int)
          | div $shift) % 2) = 1 then 1 else -1 end""".stripMargin)
      }
      val sums = (0 until width).map(b => sum(vote(b)).as(s"sv$b"))
      toks.groupBy("doc_id").agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), concat(
          (0 until width).map(b => when(col(s"sv$b") > 0, "1").otherwise("0")): _*)
          .as("simhash"))
    }
    val d = corpus
    for (width <- Seq(16, 23, 128)) {
      assertSameRows(
        d.select(col("doc_id"), graft.expr.SimHashMd5Of(col("text"), width).as("simhash")),
        agg(d, width), s"simhash md5 width=$width")
    }
  }

  test("graft_top_bigram narrow kernel == exploded bigram count aggregation") {
    val d = corpus
    val base = d.withColumn("_toks", split(col("text"), "\\s+"))
    val bigrams = base.select(col("doc_id"), explode(expr(
      """case when size(_toks) >= 2
        |  then transform(sequence(1, size(_toks) - 1),
        |         i -> concat(try_element_at(_toks, i), ' ',
        |                     try_element_at(_toks, i + 1)))
        |  else array() end""".stripMargin)).as("_bg"))
    val agg = bigrams.groupBy(col("doc_id"), col("_bg")).count()
      .groupBy(col("doc_id")).agg(max("count").as("top"))
    val expect = d.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("top"), lit(0L)).as("top"))
    assertSameRows(
      d.select(col("doc_id"), graft.expr.TopBigramOf(col("text")).as("top")),
      expect, "top bigram")
  }

  test("graft_ngrams kernel == HOF transform/slice/concat_ws chain (raw + lowered)") {
    val d = corpus
    for (n <- Seq(1, 3, 8)) {
      val raw = d
        .withColumn("_ts", split(col("text"), "\\s+"))
        .select(col("doc_id"), expr(
          s"""case when size(_ts) >= $n
             |  then transform(sequence(1, size(_ts) - ${n - 1}),
             |         i -> concat_ws(' ', slice(_ts, i, $n)))
             |  else array() end""".stripMargin).as("ng"))
      assertSameRows(
        d.select(col("doc_id"), graft.expr.NgramsOf(col("text"), n).as("ng")),
        raw, s"ngrams raw n=$n")
      val lowered = d
        .withColumn("_ts", expr("filter(split(lower(text), '\\\\s+'), x -> x <> '')"))
        .select(col("doc_id"), expr(
          s"""case when size(_ts) >= $n
             |  then transform(sequence(1, size(_ts) - ${n - 1}),
             |         i -> concat_ws(' ', slice(_ts, i, $n)))
             |  else array() end""".stripMargin).as("ng"))
      assertSameRows(
        d.select(col("doc_id"),
          graft.expr.NgramsOf(col("text"), n, lower = true, dropEmpty = true).as("ng")),
        lowered, s"ngrams lowered n=$n")
    }
  }

  test("q13 winner-from-entries == groupBy min(struct) derivation") {
    import spark.implicits._
    val dict = graft.link.UnitDict.defaultRows
      .toDF("key", "key_kind", "parse_order", "unit_iri", "unit_type")
    val grouped = dict.groupBy("key")
      .agg(min(struct(col("key_kind"), col("parse_order"),
        col("unit_iri"), col("unit_type"))).as("w"))
      .select(col("key"), col("w.unit_iri").as("unit_iri"),
        col("w.unit_type").as("unit_type"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    val entries = graft.link.UnitDict.default.entries
      .map { case (k, h) => k -> (h.iri, h.rdfType) }
    assert(grouped == entries)
  }

  test("embeddingNearDups narrow buckets == crossJoin+collect_list+join formulation") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // the pre-r9 formulation, verbatim (annBuckets + id join)
    def old(nPlanes: Int, threshold: Double, maxBucket: Int): DataFrame = {
      val bucketed = Similarity.annBuckets(e, "vec_id", "embedding", nPlanes)
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy("vec_id")
      bucketed
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= maxBucket)
        .withColumn("nrm", sqrt(Similarity.dot(col("embedding"), col("embedding"))))
        .groupBy("bucket")
        .agg(array_sort(collect_list(
          struct(col("vec_id").as("id"), col("embedding").as("v"), col("nrm")))).as("items"))
        .filter(size(col("items")) > 1)
        .select(explode(expr(
          """flatten(transform(items, (a, i) ->
            |  transform(slice(items, i + 2, size(items)),
            |            b -> named_struct('id1', a.id, 'id2', b.id,
            |      'cos', aggregate(zip_with(a.v, b.v,
            |               (x, y) -> cast(x as double) * cast(y as double)),
            |               cast(0 as double), (acc, p) -> acc + p)
            |             / (a.nrm * b.nrm)))))""".stripMargin)).as("pr"))
        .filter(col("pr.cos") >= threshold)
        .select(col("pr.id1").as("id1"), col("pr.id2").as("id2"),
          col("pr.cos").as("cos"))
    }
    assertSameRows(
      Dedup.embeddingNearDups(e, "vec_id", "embedding", nPlanes = 4, threshold = 0.1),
      old(4, 0.1, 1024), "embeddingNearDups nPlanes=4")
    assertSameRows(
      Dedup.embeddingNearDups(e, "vec_id", "embedding", nPlanes = 2,
        threshold = -1.0, maxBucket = 7),
      old(2, -1.0, 7), "embeddingNearDups nPlanes=2 capped")
  }
}
