package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{CellType, MakeId}
import graft.link.UnitDict
import java.util.Base64
import scala.io.Source

/** Table-driven specs against oracles generated from the reference's
  * observed behavior (tools/gen_oracles.py): every distinct cell/token in
  * the 8 example fixtures plus adversarial edges.
  */
class OracleSpec extends AnyFunSuite {

  private def b64(s: String) = new String(Base64.getDecoder.decode(s), "UTF-8")

  private def rows(name: String): Seq[Array[String]] = {
    val src = Source.fromFile(s"src/test/resources/oracle/$name", "UTF-8")
    try src.getLines().map(_.split("\t", -1)).toVector finally src.close()
  }

  test("typeOf matches reference get_value_type on all fixture cells") {
    var bad = List.empty[String]
    var n = 0
    rows("typeof.tsv").foreach { case Array(cell64, want) =>
      val cell = b64(cell64)
      val got = CellType.typeOf(cell)
      n += 1
      if (got != want && bad.size < 40)
        bad ::= s"[${cell.replace("\n", "\\n").replace("\r", "\\r")}] want=$want got=$got"
    }
    assert(bad.isEmpty, s"\n${bad.reverse.mkString("\n")}\n(total $n)")
  }

  test("makeId matches reference make_id") {
    var bad = List.empty[String]
    rows("makeid.tsv").foreach { case Array(cell64, want64) =>
      val cell = b64(cell64); val want = b64(want64)
      val got = MakeId(cell)
      if (got != want && bad.size < 40) bad ::= s"[$cell] want=[$want] got=[$got]"
    }
    assert(bad.isEmpty, bad.reverse.mkString("\n"))
  }

  test("unit lookup matches reference get_unit") {
    val dict = UnitDict.default
    var bad = List.empty[String]
    rows("unit.tsv").foreach { case Array(cell64, wantIri, wantType) =>
      val cell = b64(cell64)
      val got = dict.lookup(cell)
      val gi = got.map(_.iri).getOrElse("")
      val gt = got.map(_.rdfType).getOrElse("")
      if ((gi != wantIri || gt != wantType) && bad.size < 40)
        bad ::= s"[$cell] want=[$wantIri $wantType] got=[$gi $gt]"
    }
    assert(bad.isEmpty, bad.reverse.mkString("\n"))
  }
}
