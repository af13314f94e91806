package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Expression (codegen) for the *exact* reference cell
  * type sniff — the full CellType.typeOf cascade including the
  * literal_eval emulation and the dateutil-port date battery, none of
  * which is expressible in built-in SQL functions. This is extension
  * point (b) of the preference order: a native Expression, not a UDF —
  * it participates in whole-stage codegen via a static call.
  */
case class CellTypeOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_typeof requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_typeof"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.text.CellType.typeOf(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.CellType.typeOf($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CellTypeOf =
    copy(child = newChild)
}

object CellTypeOf {
  def apply(c: Column): Column = GraftBridge.column(CellTypeOf(GraftBridge.expression(c)))

  /** Register as SQL function `graft_typeof` for use inside expr() HOFs. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_typeof", exprs => CellTypeOf(exprs.head), "scala_udf")
}
