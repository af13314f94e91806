package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash in ONE narrow pass: tokenize, build the
  * distinct n-token shingles, and keep the running minimum of
  * xxhash64(salt_j, shingle) for k salts — no shingle explode, no
  * per-document aggregation shuffle. Signatures for a 100 TB corpus
  * compute at scan speed; only the LSH bucket join that follows is wide.
  *
  * Hash recipe = Spark's own `xxhash64(lit(j), shingle)` builtin (seed
  * 42, int salt then UTF8String — `XXH64.hashInt` / `hashUTF8String`),
  * so `graft_minhash(text, n, k)[j]` equals the exploded
  * `min(xxhash64(lit(j), sh))` bit-for-bit (pinned by OpsSpec), and the
  * distinct-shingle set matches [[ShinglesOf]] exactly.
  */
case class MinHashOf(child: Expression, n: Int, k: Int) extends UnaryExpression {

  require(n >= 1 && k >= 1, "shingle width and signature size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(v: Any): Any =
    MinHashOf.kernel(v.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHashOf.kernel($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashOf =
    copy(child = newChild)
}

object MinHashOf {
  def apply(c: Column, n: Int, k: Int): Column =
    GraftBridge.column(MinHashOf(GraftBridge.expression(c), n, k))

  private val Seed = 42L // spark.sql.functions.xxhash64's seed

  def kernel(text: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = text.toString.split("\\s+", -1)
    val count = math.max(toks.length - n + 1, 1)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // distinct shingles, same first-occurrence semantics as ShinglesOf
    // (min() is insensitive to duplicates, but skipping them saves hashes)
    val seen = new java.util.HashSet[String](count * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        if (i + t < toks.length) sb.append(toks(i + t))
        t += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        val u = UTF8String.fromString(sh)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUTF8String(u, XXH64.hashInt(j, Seed))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
