package graft.rdf

import scala.collection.mutable

/** Canonicalization + precision/recall comparison of triple sets
  * (SURVEY.md §5.2-3, the BASELINE metric):
  *  - literal normalization: plain == ^^xsd:string; numeric literals
  *    (integer/double/decimal/float/nonNegativeInteger) by value
  *  - prov:generatedAtTime triples dropped (timestamps)
  *  - blank-node canonical labels via iterative structural hashing
  *    (URDNA-style refinement over in+out neighborhoods); skolem IRIs
  *    are treated as blank
  */
object Canon {

  private val NumTypes = Set("integer", "double", "decimal", "float",
    "nonNegativeInteger", "long", "int").map(Term.XsdNs + _)
  private val GenAtTime = Term.iri(Term.ProvNs + "generatedAtTime")

  private val TypedLit = """^"(.*)"\^\^<([^>]+)>$""".r
  private val PlainLit = """^"(.*)"$""".r

  def normTerm(t: String): String = t match {
    case TypedLit(lex, dt) if dt == Term.XsdNs + "string" => "\"" + lex + "\""
    case TypedLit(lex, dt) if NumTypes.contains(dt) =>
      val canon =
        try BigDecimal(lex).bigDecimal.stripTrailingZeros.toPlainString
        catch { case _: NumberFormatException => lex } // nan/inf lexicals
      "\"" + canon + "\"^^<num>"
    case TypedLit(lex, dt) if dt == Term.XsdNs + "boolean" =>
      "\"" + lex.toLowerCase + "\"^^<" + dt + ">"
    case other => other
  }

  def normalize(triples: Seq[Triple]): Vector[Triple] =
    triples.filterNot(_.pred == GenAtTime)
      .map(t => Triple(normTerm(t.subj), t.pred, normTerm(t.obj)))
      .toVector

  /** Replace blank-ish nodes with canonical labels derived from iterative
    * neighborhood hashing; ground terms are their own labels.
    */
  def canonicalize(triples: Seq[Triple]): Vector[Triple] = {
    val ts = normalize(triples)
    val blanks = mutable.LinkedHashSet.empty[String]
    ts.foreach { t =>
      if (Term.isBlankish(t.subj)) blanks += t.subj
      if (Term.isBlankish(t.obj)) blanks += t.obj
    }
    if (blanks.isEmpty) return ts
    var label: Map[String, String] = blanks.iterator.map(_ -> "b").toMap
    val outEdges = ts.filter(t => Term.isBlankish(t.subj)).groupBy(_.subj)
    val inEdges = ts.filter(t => Term.isBlankish(t.obj)).groupBy(_.obj)
    def termLabel(t: String): String = label.getOrElse(t, t)
    for (_ <- 0 until 6) {
      label = blanks.iterator.map { b =>
        val out = outEdges.getOrElse(b, Vector.empty)
          .map(t => t.pred + " " + termLabel(t.obj)).sorted
        val in = inEdges.getOrElse(b, Vector.empty)
          .map(t => termLabel(t.subj) + " " + t.pred).sorted
        b -> md5(label(b) + "|" + out.mkString(";") + "|" + in.mkString(";"))
      }.toMap
    }
    ts.map(t => Triple(termLabel(t.subj), t.pred, termLabel(t.obj)))
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString

  final case class PR(precision: Double, recall: Double, mine: Int,
                      golden: Int, matched: Int,
                      missing: Vector[Triple], extra: Vector[Triple])

  /** Multiset precision/recall of canonicalized triple sets. */
  def compare(mine: Seq[Triple], golden: Seq[Triple]): PR = {
    val a = canonicalize(mine)
    val b = canonicalize(golden)
    val countA = a.groupBy(identity).view.mapValues(_.size).toMap
    val countB = b.groupBy(identity).view.mapValues(_.size).toMap
    val matched = countA.map { case (t, n) => math.min(n, countB.getOrElse(t, 0)) }.sum
    val missing = countB.collect {
      case (t, n) if n > countA.getOrElse(t, 0) => Vector.fill(n - countA.getOrElse(t, 0))(t)
    }.flatten.toVector
    val extra = countA.collect {
      case (t, n) if n > countB.getOrElse(t, 0) => Vector.fill(n - countB.getOrElse(t, 0))(t)
    }.flatten.toVector
    PR(if (a.isEmpty) 1.0 else matched.toDouble / a.size,
       if (b.isEmpty) 1.0 else matched.toDouble / b.size,
       a.size, b.size, matched, missing, extra)
  }
}
