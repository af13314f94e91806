package graft.streaming

import org.apache.spark.sql.types._

/** Shared kernels for the streaming operators — ONE definition of the
  * doc-id ordering and the line/n-gram hash, so the batch-parity rules
  * cannot drift between files.
  */
private[streaming] object StreamingUtil {

  def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Does this doc-id type compare NUMERICALLY in the batch engines'
    * `orderBy(idCol)` / `min(struct(id, ...))` orderings? Beyond the
    * integral types, decimal and floating ids count too — Hive/JDBC
    * ingestion routinely widens bigint to decimal(20,0), and a
    * lexicographic "10" < "9" there would keep the wrong document.
    */
  def isNumericId(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Compare two STRINGIFIED doc ids under the native batch ordering:
    * numeric ids by value (BigDecimal handles decimal/float renderings
    * exactly), strings lexicographically; nulls FIRST (Spark's window
    * asc-nulls-first default) — a dirty null id must tie-break like the
    * batch window does, not NPE the stateful operator.
    *
    * Float/Double ids can render as "NaN"/"Infinity"/"-Infinity", which
    * BigDecimal rejects; they are ordered the way Spark orders doubles
    * (-Infinity < finite < Infinity < NaN) instead of throwing.
    */
  def idCompare(numeric: Boolean, a: String, b: String): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else if (numeric) {
      // Spark's total order on floating types: -Inf < finite < +Inf < NaN
      def rank(s: String): Int = s match {
        case "-Infinity" => -1
        case "Infinity" => 1
        case "NaN" => 2
        case _ => 0
      }
      val (ra, rb) = (rank(a), rank(b))
      if (ra != 0 || rb != 0) Integer.compare(ra, rb)
      else new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    } else a.compareTo(b)

  /** [[idCompare]] as a serializable String ordering. */
  final case class IdOrdering(numeric: Boolean) extends Ordering[String] {
    def compare(a: String, b: String): Int = idCompare(numeric, a, b)
  }
}
