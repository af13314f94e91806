package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All language-ID n-gram scores in ONE zero-allocation pass: slide a
  * 3-char window over the space-padded lowercase text and accumulate
  * each language's profile weight via binary search over a sorted
  * packed-trigram key table (3 UTF-16 units packed into one long — the
  * [[graft.ops.LangNgram]] profiles are BMP-only by construction).
  *
  * Bit-identical to LangNgram's HOF `aggregate` form (pinned by
  * OpsSpec): the HOF enumerates `length(text)` codepoint-indexed
  * windows while this kernel walks UTF-16 units, but any window
  * containing a surrogate half cannot match a profile gram (profile
  * grams are letters+spaces), and every surrogate-free window exists
  * identically in both segmentations — so the scores agree on all
  * inputs. The bench reason to exist: the interpreted HOF does ~4
  * linear map scans per trigram (q21 at sf0.1: 7.4 s); this kernel is
  * one binary search per window inside whole-stage codegen.
  */
case class LangScoresOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lang_scores requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lang_scores"

  override def nullSafeEval(v: Any): Any =
    LangScoresOf.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.LangScoresOf.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): LangScoresOf =
    copy(child = newChild)
}

object LangScoresOf {
  def apply(c: Column): Column =
    GraftBridge.column(LangScoresOf(GraftBridge.expression(c)))

  val NumLangs: Int = graft.ops.LangNgram.Langs.size

  private def pack(g: String): Long =
    (g.charAt(0).toLong << 32) | (g.charAt(1).toLong << 16) | g.charAt(2).toLong

  /** Sorted packed-gram keys + per-key weight rows, built once from the
    * LangNgram profiles (deterministic).
    */
  private val (keys: Array[Long], weights: Array[Array[Long]]) = {
    val byGram = scala.collection.mutable.Map.empty[Long, Array[Long]]
    for {
      (l, li) <- graft.ops.LangNgram.Langs.zipWithIndex
      (g, w) <- graft.ops.LangNgram.Profiles(l)
    } {
      require(g.length == 3 && !g.exists(Character.isSurrogate),
        s"profile gram must be 3 BMP chars: '$g'")
      byGram.getOrElseUpdate(pack(g), new Array[Long](NumLangs))(li) += w
    }
    val sorted = byGram.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  def kernel(text: UTF8String): ArrayData = {
    val body = text.toLowerCase.toString
    val scores = new Array[Long](NumLangs)
    val n = body.length
    // padded = ' ' + body + ' ' walked without materializing it
    var i = -1 // window start within the padded string
    while (i <= n - 2) {
      val c0 = if (i < 0) ' ' else body.charAt(i)
      val c1 = if (i + 1 < n) body.charAt(i + 1) else ' '
      val c2 = if (i + 2 < n) body.charAt(i + 2) else ' '
      val key = (c0.toLong << 32) | (c1.toLong << 16) | c2.toLong
      val idx = java.util.Arrays.binarySearch(keys, key)
      if (idx >= 0) {
        val w = weights(idx)
        var j = 0
        while (j < NumLangs) { scores(j) += w(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(scores)
  }
}
