package graft.stage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-Catalyst per-document segmenter: one Column expression computing
  * the A1 run-length segments from the `spans` array — no shuffle, no
  * JVM lambda, no UDF; only codegen-able built-ins and higher-order
  * functions (north-star: "Catalyst-compiled UDF-free expressions").
  *
  * Linear construction: per-line votes via regexp_count, run *starts*
  * via an index-filter against the previous vote, runs via a transform
  * over the boundaries — O(lines) per document, all inside one
  * projection. Proven equal to the scalar core (SegmenterExprSpec).
  */
object SegmenterExpr {

  /** struct(sep, cnt) vote for one line expression (annotator.py:254-277
    * semantics incl. the German-comma fallback). */
  def voteSqlPublic(line: String): String = voteSql(line)

  private def voteSql(line: String): String = {
    val c = Seq(
      s"regexp_count($line, ';')",
      s"regexp_count($line, '\\\\|')",
      s"regexp_count($line, ':+\\\\s+\\\\s*')",
      s"regexp_count($line, '\\\\t')",
      s"regexp_count($line, ',')")
    val seps = Seq("';'", "'\\\\|'", "':+\\\\s+\\\\s*'", "'\\\\t'", "','")
    // first-wins argmax over the 4 non-comma counts
    val ncSep =
      s"""CASE WHEN ${c(0)} >= ${c(1)} AND ${c(0)} >= ${c(2)} AND ${c(0)} >= ${c(3)} THEN ${seps(0)}
         |     WHEN ${c(1)} >= ${c(2)} AND ${c(1)} >= ${c(3)} THEN ${seps(1)}
         |     WHEN ${c(2)} >= ${c(3)} THEN ${seps(2)} ELSE ${seps(3)} END""".stripMargin
    val ncCnt = s"greatest(${c(0)}, ${c(1)}, ${c(2)}, ${c(3)})"
    // NB: greatest(non-comma) equals the count of the first-wins winner
    // only when that winner holds the max — which argmax guarantees.
    s"""CASE
       | WHEN greatest(${c.mkString(",")}) = 0 THEN struct(cast(null as string) AS sep, 0 AS cnt)
       | WHEN ${c(4)} > $ncCnt THEN
       |   CASE WHEN $ncCnt >= ${c(4)} - 1
       |        THEN struct($ncSep AS sep, $ncCnt AS cnt)
       |        ELSE struct(',' AS sep, ${c(4)} AS cnt) END
       | ELSE struct($ncSep AS sep, $ncCnt AS cnt)
       |END""".stripMargin
  }

  /** array<struct<start,end,sep,cnt>> of maximal runs with a separator,
    * from a spans column. Everything in one narrow projection.
    */
  def segmentsCol(spansCol: String): Column = expr(
    s"""element_at(transform(
       |  array(transform(
       |    array_sort(filter($spansCol, s -> s.kind = 'text'), (a, b) -> a.offset - b.offset),
       |    s -> ${voteSql("s.text")})), votes ->
       |  element_at(transform(
       |    array(filter(sequence(0, size(votes) - 1),
       |                 i -> i = 0 OR NOT (try_element_at(votes, i + 1) <=> try_element_at(votes, i)))),
       |    bs ->
       |    filter(
       |      transform(bs, (b, j) -> named_struct(
       |        'start', b,
       |        'end', coalesce(try_element_at(bs, j + 2), size(votes)),
       |        'sep', try_element_at(votes, b + 1).sep,
       |        'cnt', try_element_at(votes, b + 1).cnt)),
       |      r -> r.sep IS NOT NULL)), 1)), 1)""".stripMargin)
}
