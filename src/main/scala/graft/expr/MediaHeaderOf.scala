package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native media-container header decode over a binary payload column:
  * `graft_media_header(payload)` -> struct(format, width, height,
  * bit_depth), null for unrecognized/truncated payloads. The byte-level
  * parse (PNG/GIF/JPEG/BMP — pure JVM, no codecs) lives in
  * [[graft.ops.Multimodal.headerDecode]]; this Expression keeps it
  * inside whole-stage codegen so header extraction runs at scan speed
  * over a 100 TB media table with the payload column never leaving the
  * task.
  */
case class MediaHeaderOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_media_header requires a binary input, got $dt")
  }

  override def dataType: DataType = MediaHeaderOf.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_media_header"

  override def nullSafeEval(payload: Any): Any =
    graft.ops.Multimodal.headerRow(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.ops.Multimodal.headerRow($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderOf =
    copy(child = newChild)
}

object MediaHeaderOf {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false)))

  def apply(payload: Column): Column =
    GraftBridge.column(MediaHeaderOf(GraftBridge.expression(payload)))

  /** Register as SQL function `graft_media_header`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_media_header", exprs => MediaHeaderOf(exprs.head), "scala_udf")
}
