package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming benchmark decontamination — the stateless leg of the
  * curation funnel: the benchmark (test-set) n-gram table is STATIC
  * and small, so the streaming form is a stream-static broadcast join
  * (no state store, no watermark, append-safe). Each micro-batch of
  * corpus documents emits one row per (doc, benchmark n-gram) overlap;
  * a clean document emits nothing.
  *
  * Parity with the batch operator ([[graft.ops.TextAnalysis
  * .decontaminate]]): the distinct (doc_id, ng) pairs accumulated over
  * all micro-batches equal the batch operator's hit set on the same
  * corpus — the per-doc `n_hits` is a distinct-count over this stream
  * (left to the consumer: a corpus-lifetime distinct aggregation does
  * not belong in executor state). Pinned by StreamingSpec across a
  * checkpointed restart.
  *
  * Scale: the bench side broadcasts (test sets are at most millions of
  * n-grams); the corpus stream never shuffles — explode + broadcast
  * hash join runs at scan speed, and the emitted volume is O(hits).
  */
object StreamingDecontam {

  /** Streaming docs (idCol, textCol) -> streaming overlap hits
    * (idCol, ng). `bench` is a static DataFrame with `textCol`.
    */
  def hits(corpus: DataFrame, bench: DataFrame, idCol: String,
           textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram order $n")
    val benchNg = graft.ops.TextAnalysis.withTokenNgrams(bench, textCol, n)
      .select(explode(col("_ng")).as("ng")).distinct()
    graft.ops.TextAnalysis.withTokenNgrams(corpus, textCol, n)
      .select(col(idCol), explode_outer(col("_ng")).as("ng"))
      .join(broadcast(benchNg), "ng")
      .select(col(idCol), col("ng"))
  }
}
