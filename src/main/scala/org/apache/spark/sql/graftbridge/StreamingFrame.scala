package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The one `private[sql]` doorway a V1 streaming `Source` needs:
  * `getBatch` must hand the engine an `isStreaming = true` DataFrame
  * (`MicroBatchExecution` asserts it), and the sanctioned way to build
  * one from resolved batch relations is what Spark's own
  * `FileStreamSource.getBatch` does — resolve the files as a batch
  * relation, re-tag it streaming, and wrap it with `Dataset.ofRows`.
  * This bridge lives under `org.apache.spark.sql` solely to reach that
  * constructor; it contains no engine logic.
  */
object StreamingFrame {

  /** Re-tag every leaf relation of a BATCH DataFrame as streaming. */
  def asStreaming(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case loc: LocalRelation => loc.copy(isStreaming = true)
    }
    Dataset.ofRows(df.sparkSession.asInstanceOf[ClassicSession], plan)
  }

  /** An empty streaming-tagged frame with the given schema (the
    * no-new-lineage micro-batch).
    */
  def emptyStreaming(spark: org.apache.spark.sql.SparkSession,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession],
      LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        Seq.empty, isStreaming = true))
}
