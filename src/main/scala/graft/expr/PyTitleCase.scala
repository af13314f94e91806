package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Expression (with codegen) for Python `str.title()`
  * semantics — the one primitive Spark lacks for the reference's
  * `make_id` (annotator.py:174-184): `initcap` only splits on
  * whitespace, while Python title-cases after *any* uncased character
  * ("190C_1000h_1" -> "190C_1000H_1"). SURVEY.md §7.3.
  */
case class PyTitleCase(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"py_titlecase requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "py_titlecase"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.text.PyStr.title(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.PyStr.title($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): PyTitleCase =
    copy(child = newChild)
}

object PyTitleCase {
  def apply(c: Column): Column = GraftBridge.column(PyTitleCase(GraftBridge.expression(c)))
}
