package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document md5 MinHash in ONE narrow pass — the cross-engine
  * (DuckDB-parity) sibling of [[MinHashOf]]: tokenize, build the
  * distinct n-token shingles, and keep the lexicographic minimum of
  * `md5(j || ':' || shingle)` for the k salts 0..k-1. No shingle
  * explode, no per-document aggregation shuffle: signatures compute at
  * scan speed and only the LSH bucket shuffle that follows is wide.
  *
  * Hash recipe = the exploded `min(md5(concat(lit(s"$j:"), sh)))` over
  * `explode(graft_shingles(text, n))` bit-for-bit (pinned by OpsSpec):
  * md5 is hex-lowercase of the UTF-8 bytes, and the lexicographic
  * minimum of the hex strings equals the unsigned-byte minimum of the
  * raw digests, so the kernel compares 16-byte digests and hex-encodes
  * only the k winners. Shingle construction (split regex, '' padding,
  * >= 1 shingle even for short docs) matches [[ShinglesOf]] exactly;
  * min() is duplicate-insensitive, so the distinct-shingle skip only
  * saves hashes.
  */
case class MinHashMd5Of(child: Expression, n: Int, k: Int) extends UnaryExpression {

  require(n >= 1 && k >= 1, "shingle width and signature size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_md5 requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_md5"

  override def nullSafeEval(v: Any): Any =
    MinHashMd5Of.kernel(v.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHashMd5Of.kernel($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5Of =
    copy(child = newChild)
}

object MinHashMd5Of {
  def apply(c: Column, n: Int, k: Int): Column =
    GraftBridge.column(MinHashMd5Of(GraftBridge.expression(c), n, k))

  /** "j:" salt prefixes (ASCII), cached for the common small k. */
  private val Prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(j => (j.toString + ":").getBytes("UTF-8"))

  private def prefix(j: Int): Array[Byte] =
    if (j < Prefixes.length) Prefixes(j) else (j.toString + ":").getBytes("UTF-8")

  private val Md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def kernel(text: UTF8String, n: Int, k: Int): ArrayData = {
    val md = Md.get()
    val toks = text.toString.split("\\s+", -1)
    val count = math.max(toks.length - n + 1, 1)
    // running minimum digests (16 raw bytes each; unsigned-byte order ==
    // hex-string lexicographic order)
    val mins = new Array[Array[Byte]](k)
    val seen = new java.util.HashSet[String](count * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        // out-of-range appends nothing — ShinglesOf's coalesce(..., '')
        if (i + t < toks.length) sb.append(toks(i + t))
        t += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        val shBytes = sh.getBytes("UTF-8")
        var j = 0
        while (j < k) {
          md.reset()
          md.update(prefix(j))
          md.update(shBytes)
          val d = md.digest()
          if (mins(j) == null || java.util.Arrays.compareUnsigned(d, mins(j)) < 0)
            mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) { out(j) = hex(mins(j)); j += 1 }
    new GenericArrayData(out)
  }
}
