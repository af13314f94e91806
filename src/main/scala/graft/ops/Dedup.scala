package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All recipes are hash-deterministic (md5) so results are identical
  * across engines, cluster sizes, and retries.
  *
  * Scale notes (100 TB): exact dedup is one shuffle on a 16-byte key;
  * MinHash/LSH replaces the quadratic all-pairs comparison with a
  * band-bucket shuffle whose fan-in is bounded by bucket size; SimHash
  * is fully narrow until its final fingerprint groupBy.
  */
object Dedup {

  val TokenSplitSql = "\\\\s+"

  /** Exact content dedup: groupBy md5(content), keep the smallest id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("h", md5(col(textCol)))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min(idCol).as("keep_id"))

  /** Distinct n-token shingles of a text column. The token array is
    * bound once via a single-element-array lambda so the regex split is
    * not re-executed per element.
    */
  def shingles(textCol: String, n: Int): Column = {
    val parts = (1 until n)
      .map(k => s"|| ' ' || coalesce(try_element_at(t, i + $k), '')").mkString(" ")
    expr(s"""element_at(transform(array(split($textCol, '$TokenSplitSql')), t ->
      array_distinct(transform(sequence(1, greatest(size(t) - ${n - 1}, 1)),
        i -> try_element_at(t, i) $parts))), 1)""")
  }

  /** MinHash signatures: sig_j = min md5(j || ':' || shingle); k salts. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, shingleN: Int = 3): DataFrame = {
    // explode + groupBy-agg: the shingle array is computed once per row
    // (k parallel min-aggregates), instead of k inlined recomputations
    val sh = df.select(col(idCol), explode(shingles(textCol, shingleN)).as("sh"))
    val aggs = (0 until k).map(j =>
      min(md5(concat(lit(s"$j:"), col("sh")))).as(s"sig$j"))
    sh.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: hash bands of the signature into bucket keys, then
    * bucket-join for candidate pairs. bands*rowsPerBand must == k.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, bands: Int = 2, shingleN: Int = 3): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatures(df, idCol, textCol, k, shingleN)
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|", (b * rows until (b + 1) * rows).map(j => col(s"sig$j")): _*))
    }
    val buckets = sig.select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bucket"))
    buckets.as("a").join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** SimHash fingerprint over distinct tokens (width bits, <= 64). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              width: Int = 64): DataFrame = {
    val toks = df.select(col(idCol),
        explode(expr(s"array_distinct(split($textCol, '$TokenSplitSql'))")).as("tok"))
      .withColumn("h", md5(col("tok")))
    toks.select(col(idCol), col("h"),
        explode(sequence(lit(0), lit(width - 1))).as("bit"))
      .withColumn("v", expr(
        "case when ((cast(conv(substring(h, (bit div 4) + 1, 1), 16, 10) as int) div cast(pow(2, 3 - bit % 4) as int)) % 2) = 1 then 1 else -1 end"))
      .groupBy(col(idCol), col("bit")).agg(sum("v").as("sv"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("bit"),
        when(col("sv") > 0, "1").otherwise("0").as("b")))).as("bs"))
      .select(col(idCol), expr("concat_ws('', transform(bs, x -> x.b))").as("simhash"))
  }

  /** n-gram Jaccard over a banded candidate set (same group, bounded id
    * distance) — the verification stage after LSH candidate generation.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, window: Int = 20, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), col(groupCol).as("g"),
      shingles(textCol, n).as("sh"))
    sh.as("a").join(sh.as("b"),
        col("a.g") === col("b.g") && col("b.id") > col("a.id") &&
          col("b.id") <= col("a.id") + window)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          (size(col("a.sh")) + size(col("b.sh")) -
            size(array_intersect(col("a.sh"), col("b.sh"))))).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs within LSH buckets: see
    * [[Similarity.annBuckets]] for bucketing; join within buckets, keep
    * pairs above threshold.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        nPlanes: Int, threshold: Double): DataFrame = {
    val bucketed = Similarity.annBuckets(df, idCol, vecCol, nPlanes)
      .join(df.select(col(idCol), col(vecCol)), idCol)
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", Similarity.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("cos") >= threshold)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"), col("cos"))
  }
}
