package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document SimHash in ONE narrow pass: distinct whitespace
  * tokens, per token h = xxhash64(token) (Spark's builtin recipe, seed
  * 42), per bit b a +/-1 vote from bit b of h, fingerprint bit b set
  * iff the vote sum is positive. Returns the `width`-bit fingerprint as
  * a long (bit 0 = lowest bit of the hash). No token explode, no
  * aggregation shuffle — the scale-path counterpart of the md5/oracle
  * SimHash form (q17), pinned equal to the exploded DataFrame
  * formulation by OpsSpec.
  */
case class SimHash64Of(child: Expression, width: Int) extends UnaryExpression {

  require(width >= 1 && width <= 64, "width must be 1..64")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires STRING input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(v: Any): Any =
    SimHash64Of.kernel(v.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHash64Of.kernel($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Of =
    copy(child = newChild)
}

object SimHash64Of {
  def apply(c: Column, width: Int): Column =
    GraftBridge.column(SimHash64Of(GraftBridge.expression(c), width))

  private val Seed = 42L

  def kernel(text: UTF8String, width: Int): Long = {
    val toks = text.toString.split("\\s+", -1)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val votes = new Array[Int](width)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(t), Seed)
        var b = 0
        while (b < width) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < width) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
