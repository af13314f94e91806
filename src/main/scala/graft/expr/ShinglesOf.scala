package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-token whitespace shingles as ONE native expression — the
  * hot head of MinHash / Jaccard / fingerprint. Bit-identical to the
  * HOF composition
  * `array_distinct(transform(sequence(1, greatest(size(t)-n+1, 1)),
  *   i -> t[i] || ' ' || coalesce(try_element_at(t, i+k), '')))`
  * over `t = split(text, '\\s+')` (pinned by OpsSpec), including
  * split's kept leading/trailing empty tokens and the '' padding when
  * the text has fewer than n tokens — but built in one pass without
  * per-element interpreted lambdas.
  */
case class ShinglesOf(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(v: Any): Any =
    ShinglesOf.kernel(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShinglesOf.kernel($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesOf =
    copy(child = newChild)
}

object ShinglesOf {
  def apply(c: Column, n: Int): Column =
    GraftBridge.column(ShinglesOf(GraftBridge.expression(c), n))

  /** Java String.split(re, -1) == Spark split(str, re): trailing empty
    * tokens kept, leading empty when the text starts with whitespace.
    */
  def kernel(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    val count = math.max(toks.length - n + 1, 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        // out-of-range appends nothing — the HOF's coalesce(..., '')
        if (i + k < toks.length) sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
