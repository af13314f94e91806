package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM pins for the shared streaming kernels (no SparkSession). */
class StreamingUtilSpec extends AnyFunSuite {

  test("idCompare numeric: NaN/Infinity renderings order like Spark doubles, no throw") {
    def c(a: String, b: String) = StreamingUtil.idCompare(numeric = true, a, b)
    // Spark's total order on floating types: -Inf < finite < +Inf < NaN
    assert(c("-Infinity", "-1.0e300") < 0)
    assert(c("-1.0e300", "Infinity") < 0)
    assert(c("Infinity", "NaN") < 0)
    assert(c("NaN", "NaN") == 0)
    assert(c("Infinity", "Infinity") == 0)
    assert(c("-Infinity", "-Infinity") == 0)
    assert(c("NaN", "42") > 0)
    assert(c("42", "NaN") < 0)
    // nulls still first, even against the specials
    assert(c(null, "NaN") < 0)
    assert(c("-Infinity", null) > 0)
    // finite comparisons still exact BigDecimal (the "10" < "9" trap)
    assert(c("10", "9") > 0)
    assert(c("10.0", "10") == 0)
  }

  test("idCompare non-numeric stays lexicographic") {
    assert(StreamingUtil.idCompare(numeric = false, "10", "9") < 0)
    assert(StreamingUtil.idCompare(numeric = false, "NaN", "NaN") == 0)
  }
}
