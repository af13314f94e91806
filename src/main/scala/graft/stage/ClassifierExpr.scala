package graft.stage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Stages B+C (segmentation + block classification) as ONE Catalyst
  * Column expression — no UDFs, no shuffles; the only custom piece is
  * the native `graft_typeof` Expression (register CellTypeOf first).
  *
  * This is the capability demonstration for the north-star's
  * "Catalyst-compiled UDF-free expressions": it reproduces the scalar
  * core bit-for-bit (ClassifierExprSpec) including the 30-line sampling
  * cap, the NUMBER coalescing, the no-data fallback and part numbering.
  * The scalar core remains the production path (dynamic per-part regex
  * split costs a Pattern compile per row here).
  */
object ClassifierExpr {

  /** array<struct<key,start,end,sep,cnt,segType>> per document. */
  def partsCol(spansCol: String): Column = {
    val runs = // from SegmenterExpr: runs with sep != null
      s"""element_at(transform(
         |  array(filter(sequence(0, size(votes) - 1),
         |               i -> i = 0 OR NOT (try_element_at(votes, i + 1) <=> try_element_at(votes, i)))),
         |  bs ->
         |  filter(
         |    transform(bs, (b, j) -> named_struct(
         |      'start', b,
         |      'end', coalesce(try_element_at(bs, j + 2), size(votes)),
         |      'sep', try_element_at(votes, b + 1).sep,
         |      'cnt', try_element_at(votes, b + 1).cnt)),
         |    r -> r.sep IS NOT NULL)), 1)""".stripMargin

    // type matrix of the first <=30 lines of a run; cells by raw regex
    // split of the line (incl. its newline), NUMBER-coalesced
    val sample =
      s"""transform(slice(lines, r.start + 1, least(30, r.end - r.start)),
         |  l -> transform(split(l, r.sep, -1),
         |         c -> CASE WHEN graft_typeof(c) IN ('INT', 'FLOAT') THEN 'NUMBER'
         |                   ELSE graft_typeof(c) END))""".stripMargin

    // classification flags over the bound sample (annotator.py:488-568)
    val classified =
      s"""element_at(transform(array($sample), sample ->
         |  CASE
         |   WHEN r.end - r.start = 1 OR r.sep = ':+\\\\s+\\\\s*' THEN 'meta'
         |   ELSE element_at(transform(array(named_struct(
         |     'sameAsFirst', forall(sample, row -> row = element_at(sample, 1)),
         |     'firstColText', forall(sample, row -> try_element_at(row, 1) = 'TEXT'),
         |     'nHeader', aggregate(sample, named_struct('n', 0, 'stop', false),
         |        (acc, row) -> IF(acc.stop OR exists(row, t -> t != 'TEXT'),
         |                         named_struct('n', acc.n, 'stop', true),
         |                         named_struct('n', acc.n + 1, 'stop', false))).n,
         |     'hasHeader', size(sample) >= 2
         |        AND forall(element_at(sample, 1), t -> t = 'TEXT')
         |        AND size(element_at(sample, 1)) > 1
         |        AND exists(slice(sample, 2, size(sample) - 1),
         |                   row -> exists(slice(row, 2, greatest(size(row) - 1, 0)),
         |                                 t -> t != 'TEXT')))), f ->
         |     element_at(transform(array(slice(sample, f.nHeader + 1, size(sample) - f.nHeader)), da ->
         |       CASE
         |        WHEN f.sameAsFirst AND f.firstColText THEN 'meta'
         |        WHEN f.firstColText
         |             AND NOT (size(da) > 0 AND forall(da, row -> row = element_at(da, 1)))
         |             AND NOT f.hasHeader
         |          THEN 'meta'
         |        ELSE 'data'
         |       END || IF(f.hasHeader, '+h', '')), 1)), 1)
         |  END), 1)""".stripMargin

    // full pipeline: lines -> votes -> runs -> classified (+fallback, numbering)
    expr(
      s"""element_at(transform(array(transform(
         |    array_sort(filter($spansCol, s -> s.kind = 'text'), (a, b) -> a.offset - b.offset),
         |    s -> s.text)), lines ->
         |element_at(transform(array(transform(lines, l -> ${SegmenterExpr.voteSqlPublic("l")})), votes ->
         |element_at(transform(array($runs), rs ->
         |element_at(transform(array(
         |    transform(rs, r -> named_struct(
         |      'start', r.start, 'end', r.end, 'sep', r.sep, 'cnt', r.cnt,
         |      'tagged', $classified))), cs ->
         |  element_at(transform(array(NOT exists(cs, c -> c.tagged IN ('data', 'data+h'))), fb ->
         |    transform(cs, (c, i) -> named_struct(
         |      'key', CASE WHEN c.tagged IN ('data', 'data+h')
         |                    OR (fb AND c.tagged = 'meta+h')
         |                  THEN 'table-' || cast(size(filter(slice(cs, 1, i + 1),
         |                         x -> x.tagged IN ('data', 'data+h')
         |                              OR (fb AND x.tagged = 'meta+h'))) as string)
         |                  ELSE 'meta-' || cast(size(filter(slice(cs, 1, i + 1),
         |                         x -> NOT (x.tagged IN ('data', 'data+h')
         |                              OR (fb AND x.tagged = 'meta+h')))) as string)
         |             END,
         |      'start', c.start, 'end', c.end, 'sep', c.sep, 'cnt', c.cnt,
         |      'segType', IF(c.tagged IN ('data', 'data+h')
         |                    OR (fb AND c.tagged = 'meta+h'), 'data', 'meta')))), 1)
         |), 1)), 1)), 1)), 1)""".stripMargin)
  }
}
