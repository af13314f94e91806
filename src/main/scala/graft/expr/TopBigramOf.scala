package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of the single most frequent word bigram of a
  * document, in ONE narrow pass: tokenize (the shared '\s+' split), form
  * the size-1 .. size-2 adjacent token pairs "a b", count them in a
  * local table, return the max count (0 when the document has fewer than
  * two tokens).
  *
  * Equals the exploded formulation
  * `max(count) over groupBy(doc, bigram)` with
  * `bigram_i = concat(try_element_at(t, i), ' ', try_element_at(t, i+1))`
  * (coalesced to 0 for bigram-less docs) bit-for-bit — pinned by
  * OpsSpec — without the per-occurrence explode, the two aggregation
  * shuffles, or the doc-keyed join back.
  */
case class TopBigramOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_bigram requires STRING input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_bigram"

  override def nullSafeEval(v: Any): Any =
    TopBigramOf.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TopBigramOf.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): TopBigramOf =
    copy(child = newChild)
}

object TopBigramOf {
  def kernel(text: UTF8String): Long = {
    val toks = text.toString.split("\\s+", -1)
    if (toks.length < 2) return 0L
    val counts = new java.util.HashMap[String, Int](toks.length * 2)
    var best = 0
    var i = 0
    while (i < toks.length - 1) {
      val bg = toks(i) + " " + toks(i + 1)
      val c = counts.merge(bg, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  def apply(c: Column): Column =
    GraftBridge.column(TopBigramOf(GraftBridge.expression(c)))
}
