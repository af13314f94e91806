package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.annotate.Annotator
import graft.ingest.{Fixtures, SpanCodec}
import graft.json._

/** Piecewise validation of segmentation / classification / pandas-like
  * parsing against the reference's mid-stage dumps
  * (src/test/resources/oracle/stages JSONs).
  */
class StageSpec extends AnyFunSuite {

  private def stageOracle(name: String): JObj =
    Json.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"src/test/resources/oracle/stages/$name.json")),
      "UTF-8")).asInstanceOf[JObj]

  private def jint(v: JValue): Int = v.asInstanceOf[JNum].literal.toInt
  private def jstr(v: JValue): String = v.asInstanceOf[JStr].s
  private def jarr(v: JValue): Vector[JValue] = v.asInstanceOf[JArr].items

  for (name <- Fixtures.Names) {
    val base = name.stripSuffix(".csv")

    test(s"$base: span round-trip") {
      val text = Fixtures.text(name)
      val doc = SpanCodec.encode(name, text)
      assert(SpanCodec.reconstruct(doc.spans) == text)
    }

    test(s"$base: segmentation & classification match reference") {
      val lines = SpanCodec.lines(Fixtures.doc(name).spans)
      val parts = Annotator.segment(lines)
      val oracle = stageOracle(base)
      val want = jarr(oracle("parts")).map(_.asInstanceOf[JObj])
      val got = parts.map { case (key, p) =>
        (key, p.start, p.end, p.sep, p.count, p.segType)
      }
      val wantT = want.map { o =>
        (jstr(o("key")), jint(o("start")), jint(o("end")), jstr(o("sep")),
         jint(o("count")), jstr(o("type")))
      }
      assert(got == wantT)
    }

    test(s"$base: meta/table part parsing matches reference") {
      val lines = SpanCodec.lines(Fixtures.doc(name).spans)
      val parts = Annotator.segment(lines)
      val oracle = stageOracle(base)
      val want = jarr(oracle("parts")).map(_.asInstanceOf[JObj])
      parts.zip(want).foreach { case ((key, p), o) =>
        if (p.segType == "meta") {
          val got = Annotator.metaPart(lines, p).map { case (param, row, vals) =>
            (param, row, vals.map(v => if (v.isNaN) null else v.render))
          }
          val wantMeta = jarr(o("meta").asInstanceOf[JObj]("params")).map { pj =>
            val Vector(pn, rn, vs) = jarr(pj)
            (jstr(pn), jint(rn), jarr(vs).map { cell =>
              val Vector(r, t) = jarr(cell)
              if (jstr(t) == "nan") null else jstr(r)
            })
          }
          assert(got.take(wantMeta.size) == wantMeta, s"$key meta params")
        } else {
          val tp = Annotator.tablePart(lines, p)
          val to = o("table").asInstanceOf[JObj]
          assert(tp.headerRows == jint(to("header_rows")), s"$key header_rows")
          val wantCols = jarr(to("columns")).map(c => jarr(c).map(jstr))
          assert(tp.columns == wantCols, s"$key columns")
          assert(tp.cells.size == jint(to("nrows")), s"$key nrows")
          val wantCells = jarr(to("cells")).map(r => jarr(r).map { cell =>
            val Vector(rd, t) = jarr(cell)
            (jstr(rd), jstr(t))
          })
          val gotCells = tp.cells.take(wantCells.size).map(_.map { v =>
            import graft.csv.PandasCsv._
            v match {
              case PNaN => ("nan", "nan")
              case PInt(x) => (x.toString, "int")
              case PFloat(x) => (graft.text.PyFloat.repr(x), "float")
              case PBool(b) => (if (b) "True" else "False", "bool")
              case PStr(s) => (s, "str")
            }
          })
          assert(gotCells == wantCells, s"$key cells")
        }
      }
    }
  }
}
