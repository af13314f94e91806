package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Scale path: brute-force cosine is the exact baseline (one broadcast of
  * the query vector, a narrow scan, and a top-k — no shuffle except the
  * final k-row ordering). For corpus-vs-corpus search, sign-projection
  * LSH buckets bound the candidate sets; IVF-style routing falls out of
  * the same shape with k-means centroids as the "planes".
  */
object Similarity {

  /** dot(a, b) — native codegen Expression (bit-identical to the HOF
    * `aggregate(zip_with(...))` form, pinned by OpsSpec; a tight
    * primitive loop instead of an interpreted lambda per element).
    */
  def dot(a: Column, b: Column): Column = graft.expr.ArrayDot(a, b)

  /** The HOF formulation, kept as the equality reference. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (broadcast). */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 query: DataFrame, k: Int): DataFrame = {
    val q = query.select(col(vecCol).as("qv"))
    df.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col(vecCol), col("qv")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Sign-random-projection buckets; planes taken deterministically from
    * the dataset's own vectors planeFrom..planeFrom+nPlanes-1.
    */
  def annBuckets(df: DataFrame, idCol: String, vecCol: String,
                 nPlanes: Int = 8, planeFrom: Long = 1): DataFrame = {
    val planes = df.filter(col(idCol).between(planeFrom, planeFrom + nPlanes - 1))
      .select(col(idCol).as("plane_id"), col(vecCol).as("pv"))
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(planes))
      .withColumn("bit", when(dot(col(vecCol), col("pv")) > 0, "1").otherwise("0"))
      .groupBy(col(idCol))
      .agg(expr("concat_ws('', transform(sort_array(collect_list(struct(plane_id, bit))), x -> x.bit))").as("bucket"))
  }

  /** IVF-style routing: assign every vector to its nearest "centroid"
    * (deterministic: dataset vectors centroidFrom..+nCells-1 serve as the
    * coarse codebook; a k-means codebook drops into the same shape), then
    * search only the query's cell. At scale the centroid table stays
    * broadcast-sized and the scan prunes to ~1/nCells of the corpus.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                nCells: Int = 16, centroidFrom: Long = 1): DataFrame = {
    val cents = df.filter(col(idCol).between(centroidFrom, centroidFrom + nCells - 1))
      .select(col(idCol).as("cell_id"), col(vecCol).as("cv"))
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .withColumn("d", cosine(col(vecCol), col("cv")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("d").desc, col("cell_id"))))
      .filter(col("rk") === 1)
      .select(col(idCol), col("cell_id"))
  }

  /** Assignment against an explicit codebook DataFrame (cell_id, cv) —
    * broadcast argmax-cosine, narrow except the tiny codebook broadcast.
    * r9 (guide §2.3): the vector and centroid columns are projected away
    * BEFORE the argmax window's exchange — the shuffle carries
    * (id, cell_id, d), not k copies of the embedding + centroid per id
    * (~20x fewer bytes at dim 64); rows, ordering, and result identical.
    */
  def ivfAssignWith(df: DataFrame, idCol: String, vecCol: String,
                    codebook: DataFrame): DataFrame =
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(codebook))
      .select(col(idCol), col("cell_id"), cosine(col(vecCol), col("cv")).as("d"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("d").desc, col("cell_id"))))
      .filter(col("rk") === 1)
      .select(col(idCol), col("cell_id"))

  /** Train an IVF codebook with Lloyd's iterations expressed as
    * DataFrame operations: assignment = broadcast-codebook argmax
    * (narrow), update = elementwise mean via posexplode + one
    * groupBy(cell, pos) — two shuffles per iteration over the TRAINING
    * SAMPLE only (at 100 TB, train on df.limit(n); the corpus-wide pass
    * is just the final broadcast assignment). Deterministic: init =
    * first k vectors in id order, ties broken by cell_id; no rand().
    * Returns (cell_id, cv).
    */
  def kmeansCodebook(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 5): DataFrame = {
    // r9 (guide §5): each Lloyd's iteration scans the training sample
    // twice (assignment + the update join) — pin it for the loop and
    // release it before returning (strictly scoped to this call; the
    // codebook itself is a driver-local table). A cached scan yields
    // the same rows in the same partition order as the source scan, so
    // the update's float summation order — and therefore the trained
    // codebook — is bit-identical (pinned by the dynamic-oracle parity).
    val vecs = df.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try kmeansLoop(df, idCol, vecCol, k, iters, vecs)
    finally vecs.unpersist(false)
  }

  private def kmeansLoop(df: DataFrame, idCol: String, vecCol: String,
                         k: Int, iters: Int, vecs: DataFrame): DataFrame = {
    // constant-valued (but non-foldable) partition key: the init ranking
    // runs over the k post-limit rows only, but a bare orderBy window
    // logs the global "no partition defined" warning on every run — the
    // q19 fix, xxhash64 so it works for any id type
    var codebook = vecs.orderBy(col(idCol)).limit(k)
      .select(row_number().over(
          Window.partitionBy(pmod(xxhash64(col(idCol)), lit(1)))
            .orderBy(col(idCol))).cast("long").as("cell_id"),
        col(vecCol).as("cv"))
    for (_ <- 1 to iters) {
      val assigned = ivfAssignWith(vecs, idCol, vecCol, codebook)
        .join(vecs, idCol)
      val updated = assigned
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell_id", "pos").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cell_id")
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> cast(s.m as float))").as("cv"))
      // materialize each round: k x dim doubles — driver-sized by design
      val rows = updated.collect()
      codebook = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), updated.schema)
    }
    codebook
  }

  /** IVF top-k against a trained codebook: exact cosine within the
    * query's cell only.
    */
  def ivfTopKWith(df: DataFrame, idCol: String, vecCol: String,
                  codebook: DataFrame, queryId: Long, k: Int): DataFrame = {
    // r9 (guide §2.4): the query's vector and cell only need the QUERY
    // ROW — derive both from a one-row filtered slice instead of the
    // full corpus-wide assignment join (which the previous shape
    // re-evaluated once per broadcast side, 3x total). Values identical:
    // the assignment of queryId is the same whether computed alone or
    // inside the corpus pass, and qVec never needed the join at all.
    val assign = ivfAssignWith(df, idCol, vecCol, codebook)
    val qRow = df.filter(col(idCol) === queryId)
    val qCell = ivfAssignWith(qRow, idCol, vecCol, codebook).select(col("cell_id"))
    val qVec = qRow.select(col(vecCol).as("qv"))
    df.join(assign, idCol)
      .join(broadcast(qCell), "cell_id")
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qVec))
      .withColumn("cos", cosine(col(vecCol), col("qv")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Multi-probe IVF top-k: scan the query's top-`probes` cells by
    * centroid cosine instead of only its own cell — the standard recall
    * lift for IVF (a query near a cell boundary keeps its true
    * neighbors that were routed to the adjacent cell). Cost scales as
    * probes/nCells of the corpus; the probe-cell selection itself is
    * driver-free: a broadcast codebook x broadcast query vector ranking.
    * Recall\@10 vs the exact scan is pinned by OpsSpec (>= 0.9 on the
    * fixture embeddings, and monotone vs single-probe).
    */
  def ivfTopKMultiProbe(df: DataFrame, idCol: String, vecCol: String,
                        codebook: DataFrame, queryId: Long, k: Int,
                        probes: Int): DataFrame = {
    val assign = ivfAssignWith(df, idCol, vecCol, codebook)
    val joined = df.join(assign, idCol)
    val qVec = df.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    val qCells = codebook.crossJoin(broadcast(qVec))
      .withColumn("d", cosine(col("cv"), col("qv")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(pmod(xxhash64(col("cell_id")), lit(1)))
          .orderBy(col("d").desc, col("cell_id"))))
      .filter(col("rk") <= probes)
      .select("cell_id")
    joined.join(broadcast(qCells), "cell_id")
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qVec))
      .withColumn("cos", cosine(col(vecCol), col("qv")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF top-k: exact cosine within the query's cell only. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nCells: Int = 16): DataFrame = {
    val assign = ivfAssign(df, idCol, vecCol, nCells)
    val joined = df.join(assign, idCol)
    val qCell = joined.filter(col(idCol) === queryId).select(col("cell_id"))
    val qVec = joined.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    joined.join(broadcast(qCell), "cell_id")
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qVec))
      .withColumn("cos", cosine(col(vecCol), col("qv")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** ANN search: restrict the exact scan to the query vector's bucket. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nPlanes: Int = 8): DataFrame = {
    val buckets = annBuckets(df, idCol, vecCol, nPlanes)
    val joined = df.join(buckets, idCol)
    val qBucket = joined.filter(col(idCol) === queryId).select(col("bucket"))
    val qVec = joined.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    joined.join(broadcast(qBucket), "bucket")
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qVec))
      .withColumn("cos", cosine(col(vecCol), col("qv")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
