package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document md5 SimHash in ONE narrow pass — the cross-engine
  * (DuckDB-parity) sibling of [[SimHash64Of]]: distinct whitespace
  * tokens, per token h = md5(token), per bit b a +/-1 vote from hex
  * nibble b/4 of h (bit within the nibble taken MSB-first), fingerprint
  * bit b = '1' iff the vote sum is positive. Returns the `width`-char
  * '0'/'1' string, bit 0 first.
  *
  * Vote recipe = the exploded q17 formulation bit-for-bit (pinned by
  * OpsSpec): `((conv(substring(md5(tok), b div 4 + 1, 1), 16, 10) div
  * (1 << (3 - b % 4))) % 2) = 1` summed over
  * `array_distinct(split(text, '\s+'))` — but with one md5 per distinct
  * token instead of a token explode + width aggregates + a shuffle.
  */
case class SimHashMd5Of(child: Expression, width: Int) extends UnaryExpression {

  require(width >= 1 && width <= 128, "md5 supplies 128 bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_md5 requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash_md5"

  override def nullSafeEval(v: Any): Any =
    SimHashMd5Of.kernel(v.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHashMd5Of.kernel($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Of =
    copy(child = newChild)
}

object SimHashMd5Of {
  def apply(c: Column, width: Int): Column =
    GraftBridge.column(SimHashMd5Of(GraftBridge.expression(c), width))

  private val Md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def kernel(text: UTF8String, width: Int): UTF8String = {
    val md = Md.get()
    val toks = text.toString.split("\\s+", -1)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val votes = new Array[Int](width)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        var b = 0
        while (b < width) {
          // hex nibble b/4: high nibble of byte b/8 when (b/4) is even
          val nib = b >> 2
          val byteV = d(nib >> 1) & 0xFF
          val v = if ((nib & 1) == 0) byteV >> 4 else byteV & 0xF
          // bit within the nibble, MSB first (shift = 1 << (3 - b%4))
          if (((v >> (3 - (b & 3))) & 1) == 1) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](width)
    var b = 0
    while (b < width) {
      out(b) = if (votes(b) > 0) '1'.toByte else '0'.toByte
      b += 1
    }
    UTF8String.fromBytes(out)
  }
}
