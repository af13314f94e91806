package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL (non-distinct, position-ordered) n-token ngrams of a text column
  * in ONE native pass — the hot head of exact-substring excision
  * (q48/q49) and corpus n-gram mining (q42/q44), replacing the
  * interpreted `transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i, n)))` lambda chain (one slice + concat_ws allocation
  * per position) and its separate split projection.
  *
  * Bit-identical (pinned by OpsSpec) to
  * `case when size(t) >= n then transform(sequence(1, size(t)-n+1),
  *    i -> concat_ws(' ', slice(t, i, n))) else array() end`
  * over `t = split(text, '\\s+')` when `lower = dropEmpty = false`, and
  * over `t = filter(split(lower(text), '\\s+'), x -> x <> '')` when
  * `lower = dropEmpty = true` (the [[graft.ops.TextAnalysis]] lowered
  * form; lowercasing uses UTF8String.toLowerCase — the exact `lower()`
  * builtin code path). Empty array when the text has fewer than n
  * tokens.
  */
case class NgramsOf(child: Expression, n: Int, lower: Boolean,
                    dropEmpty: Boolean) extends UnaryExpression {

  require(n >= 1, "ngram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def nullSafeEval(v: Any): Any =
    NgramsOf.kernel(v.asInstanceOf[UTF8String], n, lower, dropEmpty)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.NgramsOf.kernel($c, $n, $lower, $dropEmpty)")

  override protected def withNewChildInternal(newChild: Expression): NgramsOf =
    copy(child = newChild)
}

object NgramsOf {
  def apply(c: Column, n: Int, lower: Boolean = false,
            dropEmpty: Boolean = false): Column =
    GraftBridge.column(NgramsOf(GraftBridge.expression(c), n, lower, dropEmpty))

  private val Empty = new GenericArrayData(new Array[AnyRef](0))

  def kernel(text: UTF8String, n: Int, lower: Boolean,
             dropEmpty: Boolean): ArrayData = {
    // lower() builtin == UTF8String.toLowerCase — same code path, then
    // the same '\s+' split Java-regex semantics as the HOF form
    val s = if (lower) text.toLowerCase.toString else text.toString
    var toks = s.split("\\s+", -1)
    if (dropEmpty) {
      var nonEmpty = 0
      var i = 0
      while (i < toks.length) { if (toks(i).nonEmpty) nonEmpty += 1; i += 1 }
      if (nonEmpty != toks.length) {
        val t2 = new Array[String](nonEmpty)
        var j = 0
        i = 0
        while (i < toks.length) {
          if (toks(i).nonEmpty) { t2(j) = toks(i); j += 1 }
          i += 1
        }
        toks = t2
      }
    }
    if (toks.length < n) return Empty
    val count = toks.length - n + 1
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks(i + t))
        t += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
