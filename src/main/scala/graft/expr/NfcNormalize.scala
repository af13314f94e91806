package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[UnicodeNormalize]], shaped for generated Java: the
  * `isNormalized` quick-check (a table lookup over the NFC_QC /
  * NFKC_QC properties) skips the allocation entirely for the ~100% of
  * web text that is already normalized, so the scan-speed cost on a
  * 100 TB corpus is one pass over the codepoints, not a rebuild.
  */
object NfcKernel {
  def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** Unicode normalization as a native codegen Expression:
  * `graft_normalize(str, 'NFC'|'NFD'|'NFKC'|'NFKD')` — the text
  * canonicalization pass every curation pipeline runs before hashing /
  * dedup (composed vs decomposed accents, compatibility forms,
  * fullwidth digits). Spark ships no normalizer built-in; a native
  * Expression keeps it inside whole-stage codegen instead of a UDF
  * boundary. NFC parity is oracle-checked against DuckDB's
  * `nfc_normalize` (q46); NFKC folding is pinned in OpsSpec.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize requires STRING input, got ${child.dataType}")
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  @transient private lazy val f = Normalizer.Form.valueOf(form)

  override def nullSafeEval(v: Any): Any =
    NfcKernel.norm(v.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.NfcKernel.norm($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
  def apply(c: Column, form: String): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(c), form))
}
