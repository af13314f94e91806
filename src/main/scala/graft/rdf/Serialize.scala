package graft.rdf

import graft.TripleRow
import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._

/** Graph serialization sinks (reference S6 surface, SURVEY §2.1): the
  * reference exposes rdflib's formats (turtle, nt, json-ld, ...); the
  * engine's equivalents are:
  *  - "nt"        unsorted N-Triples text (fastest, narrow)
  *  - "nt-sorted" canonical globally sorted N-Triples (Pipeline)
  *  - "ttl"       Turtle: subject-grouped blocks, prefix header per part
  *                file (Turtle allows @prefix re-declaration, so
  *                concatenated part files remain one valid document)
  * Metadata JSON-LD is a per-doc column (Pipeline.metadata). Skolemized
  * bnodes are serialized as urn:skolem IRIs — isomorphic to the
  * reference's blank nodes under the comparator's canonical labeling.
  */
object Serialize {

  val Prefixes: Seq[(String, String)] = Seq(
    "rdf" -> Term.RdfNs, "rdfs" -> Term.RdfsNs, "xsd" -> Term.XsdNs,
    "csvw" -> Term.CsvwNs, "oa" -> Term.OaNs, "qudt" -> Term.QudtNs,
    "dc11" -> Term.DcNs, "prov" -> Term.ProvNs)

  private def qname(term: String): String =
    if (term.startsWith("<")) {
      val iriStr = term.substring(1, term.length - 1)
      Prefixes.collectFirst {
        case (p, ns) if iriStr.startsWith(ns) &&
          iriStr.drop(ns.length).matches("[A-Za-z0-9_-]+") =>
          s"$p:${iriStr.drop(ns.length)}"
      }.getOrElse(term)
    } else term

  /** One subject's Turtle block from its (pred, obj) pairs. */
  def subjectBlock(subj: String, pos: Seq[(String, String)]): String = {
    val sb = new StringBuilder
    sb ++= qname(subj)
    val byPred = pos.groupBy(_._1).toSeq.sortBy(_._1)
    val parts = byPred.map { case (p, oss) =>
      val pn = if (p == Term.RdfType) "a" else qname(p)
      val os = oss.map(_._2).distinct.sorted.map(qname).mkString(", ")
      s"$pn $os"
    }
    sb ++= " " + parts.mkString(" ;\n    ") + " .\n"
    sb.toString
  }

  def header: String =
    Prefixes.map { case (p, ns) => s"@prefix $p: <$ns> ." }.mkString("", "\n", "\n\n")

  /** Distributed Turtle sink: hash-partition by subject, group within
    * partitions, prefix header per part.
    */
  def writeTurtle(ts: Dataset[TripleRow], outDir: String, partitions: Int = 0): Unit = {
    import ts.sparkSession.implicits._
    val base = ts.select("subj", "pred", "obj").distinct()
    val parted = if (partitions > 0) base.repartition(partitions, col("subj"))
                 else base.repartition(col("subj"))
    parted
      .sortWithinPartitions("subj", "pred", "obj")
      .as[(String, String, String)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur: String = null
        var pos = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        def flush(): Unit = if (cur != null) {
          out += subjectBlock(cur, pos.toSeq)
          pos = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        }
        it.foreach { case (s, p, o) =>
          if (s != cur) { flush(); cur = s }
          pos += ((p, o))
        }
        flush()
        if (out.isEmpty) Iterator.empty
        else Iterator(header + out.mkString("\n"))
      }
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  private val TypedLitRe = """^"(.*)"\^\^<([^>]+)>$""".r
  private val PlainLitRe = "(?s)^\"(.*)\"$".r

  /** One RDF term -> flattened JSON-LD value object. */
  def jsonLdValue(term: String): graft.json.JValue = {
    import graft.json._
    term match {
      case TypedLitRe(lex, dt) =>
        JObj.of("@value" -> JStr(Term.unescape(lex)), "@type" -> JStr(dt))
      case PlainLitRe(lex) => JObj.of("@value" -> JStr(Term.unescape(lex)))
      case iriTerm => JObj.of("@id" -> JStr(iriTerm.substring(1, iriTerm.length - 1)))
    }
  }

  /** Flattened JSON-LD: one node object per subject, one JSON line per
    * node (concatenation of parts = a JSON-LD array body; the standard
    * "flattened" form rdflib's json-ld serializer also produces, minus
    * pretty-printing). Narrow except the subject repartition.
    */
  def writeJsonLd(ts: Dataset[TripleRow], outDir: String, partitions: Int = 0): Unit = {
    import ts.sparkSession.implicits._
    import graft.json._
    val base = ts.select("subj", "pred", "obj").distinct()
    val parted = if (partitions > 0) base.repartition(partitions, col("subj"))
                 else base.repartition(col("subj"))
    parted.sortWithinPartitions("subj", "pred", "obj")
      .as[(String, String, String)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur: String = null
        var preds = scala.collection.mutable.LinkedHashMap.empty[String, Vector[JValue]]
        def flush(): Unit = if (cur != null) {
          val node = JObj(Vector("@id" -> (JStr(cur.substring(1, cur.length - 1)): JValue)) ++
            preds.toVector.map { case (p, vs) =>
              val key = if (p == Term.RdfType) "@type" else p.substring(1, p.length - 1)
              val value: JValue =
                if (key == "@type") JArr(vs.collect { case o: JObj => o("@id") })
                else JArr(vs)
              key -> value
            })
          out += node.render
          preds = scala.collection.mutable.LinkedHashMap.empty[String, Vector[JValue]]
        }
        it.foreach { case (s0, p, o) =>
          if (s0 != cur) { flush(); cur = s0 }
          preds(p) = preds.getOrElse(p, Vector.empty) :+ jsonLdValue(o)
        }
        flush()
        out.iterator
      }
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** N-Quads with the doc_id as the graph label — per-document lineage
    * directly in the serialization. Narrow, no shuffle.
    */
  def writeNQuads(ts: Dataset[TripleRow], outDir: String): Unit = {
    import ts.sparkSession.implicits._
    ts.select(concat_ws(" ", col("subj"), col("pred"), col("obj"),
        concat(lit("<urn:graft:doc:"), col("doc_id"), lit(">")), lit(".")))
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** Unsorted N-Triples (narrow, no shuffle). */
  def writeNTriples(ts: Dataset[TripleRow], outDir: String): Unit = {
    import ts.sparkSession.implicits._
    ts.select(concat_ws(" ", col("subj"), col("pred"), col("obj"), lit(".")))
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** TriG: one named graph per document (graph IRI = urn:graft:doc:ID —
    * the same per-doc lineage writeNQuads encodes), Turtle blocks
    * inside. Prefix header per part file; TriG, like Turtle, permits
    * prefix re-declaration, so concatenated parts remain one valid
    * document. One shuffle (repartition by doc).
    */
  def writeTriG(ts: Dataset[TripleRow], outDir: String, partitions: Int = 0): Unit = {
    import ts.sparkSession.implicits._
    val base = ts.select("doc_id", "subj", "pred", "obj").distinct()
    val parted = if (partitions > 0) base.repartition(partitions, col("doc_id"))
                 else base.repartition(col("doc_id"))
    parted
      .sortWithinPartitions("doc_id", "subj", "pred", "obj")
      .as[(String, String, String, String)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
        var curDoc: String = null
        var curSubj: String = null
        var pos = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        def flushSubj(): Unit = if (curSubj != null) {
          blocks += subjectBlock(curSubj, pos.toSeq)
          pos = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        }
        def flushDoc(): Unit = if (curDoc != null) {
          flushSubj()
          out += s"<urn:graft:doc:$curDoc> {\n" + blocks.mkString("\n") + "}\n"
          blocks.clear()
          curSubj = null
        }
        it.foreach { case (d, s, p, o) =>
          if (d != curDoc) { flushDoc(); curDoc = d }
          if (s != curSubj) { flushSubj(); curSubj = s }
          pos += ((p, o))
        }
        flushDoc()
        if (out.isEmpty) Iterator.empty
        else Iterator(header + out.mkString("\n"))
      }
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** Hextuples (the reference's `hext` format, app.py:50-68): NDJSON,
    * one 6-element JSON array per statement —
    * [subject, predicate, value, datatype, language, graph] with
    * "globalId" as the datatype marker for IRI objects (the public
    * rdflib-hext profile). Graph = the per-doc lineage IRI, like
    * writeNQuads. Narrow, no shuffle.
    */
  def writeHext(ts: Dataset[TripleRow], outDir: String): Unit = {
    import ts.sparkSession.implicits._
    import graft.json._
    ts.map { t =>
      def bare(term: String) = term.substring(1, term.length - 1)
      val (value, dt) = t.obj match {
        case TypedLitRe(lex, dtIri) => (Term.unescape(lex), dtIri)
        case PlainLitRe(lex) => (Term.unescape(lex), Term.XsdNs + "string")
        case iriTerm => (bare(iriTerm), "globalId")
      }
      JArr.of(JStr(bare(t.subj)), JStr(bare(t.pred)), JStr(value),
        JStr(dt), JStr(""), JStr("urn:graft:doc:" + t.doc_id)).render
    }.write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** Format dispatcher covering the reference's serialization enum
    * (app.py:50-68). `n3` and `longturtle` are served by the Turtle
    * sink: rdflib's n3 output for graphs without formulae IS Turtle,
    * and longturtle differs only in pretty-printing.
    */
  def write(ts: Dataset[TripleRow], format: String, outDir: String): Unit =
    format match {
      case "nt" | "ntriples" => writeNTriples(ts, outDir)
      case "nquads" => writeNQuads(ts, outDir)
      case "turtle" | "ttl" | "n3" | "longturtle" => writeTurtle(ts, outDir)
      case "json-ld" => writeJsonLd(ts, outDir)
      case "trig" => writeTriG(ts, outDir)
      case "xml" | "rdf/xml" | "pretty-xml" => writeRdfXml(ts, outDir)
      case "hext" => writeHext(ts, outDir)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }

  private def xmlText(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case c => c.toString
  }
  private def xmlAttr(s: String): String = xmlText(s).replace("\"", "&quot;")

  /** Splits a predicate IRI at the last '#' or '/' into (namespace,
    * NCName local part) — the same split rdflib's RDF/XML serializer
    * performs (it likewise cannot serialize a predicate with no valid
    * QName split).
    */
  def qnameSplit(iriStr: String): (String, String) = {
    val cut = math.max(iriStr.lastIndexOf('#'), iriStr.lastIndexOf('/'))
    require(cut > 0 && cut < iriStr.length - 1, s"predicate not QName-able: $iriStr")
    val local = iriStr.substring(cut + 1)
    require(local.matches("[A-Za-z_][A-Za-z0-9_.-]*"), s"invalid NCName: $local")
    (iriStr.substring(0, cut + 1), local)
  }

  /** RDF/XML sink: subject-grouped rdf:Description blocks. Each part
    * file is a complete standalone RDF/XML document (XML cannot be
    * concatenated like Turtle; consumers read the directory as a set of
    * documents of one graph — the shape rdflib produces per file). One
    * shuffle (repartition by subject).
    */
  def writeRdfXml(ts: Dataset[TripleRow], outDir: String, partitions: Int = 0): Unit = {
    import ts.sparkSession.implicits._
    val base = ts.select("subj", "pred", "obj").distinct()
    val parted = if (partitions > 0) base.repartition(partitions, col("subj"))
                 else base.repartition(col("subj"))
    parted
      .sortWithinPartitions("subj", "pred", "obj")
      .as[(String, String, String)]
      .mapPartitions { it =>
        val ns = scala.collection.mutable.LinkedHashMap(Prefixes.map(_.swap): _*)
        def prefixOf(namespace: String): String =
          ns.getOrElseUpdate(namespace, "g" + ns.size)
        val body = new StringBuilder
        var cur: String = null
        def open(s: String): Unit = {
          body ++= s"""  <rdf:Description rdf:about="${xmlAttr(s.substring(1, s.length - 1))}">\n"""
        }
        it.foreach { case (s, p, o) =>
          if (s != cur) {
            if (cur != null) body ++= "  </rdf:Description>\n"
            cur = s; open(s)
          }
          val (pns, plocal) = qnameSplit(p.substring(1, p.length - 1))
          val pq = s"${prefixOf(pns)}:$plocal"
          o match {
            case TypedLitRe(lex, dt) =>
              body ++= s"""    <$pq rdf:datatype="${xmlAttr(dt)}">${xmlText(Term.unescape(lex))}</$pq>\n"""
            case PlainLitRe(lex) =>
              body ++= s"""    <$pq>${xmlText(Term.unescape(lex))}</$pq>\n"""
            case iriTerm =>
              body ++= s"""    <$pq rdf:resource="${xmlAttr(iriTerm.substring(1, iriTerm.length - 1))}"/>\n"""
          }
        }
        if (cur != null) body ++= "  </rdf:Description>\n"
        if (body.isEmpty) Iterator.empty
        else {
          val decls = ns.map { case (n, p) => s"""xmlns:$p="${xmlAttr(n)}"""" }
            .mkString("\n         ")
          Iterator(
            "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n" +
              s"<rdf:RDF $decls>\n" + body.toString + "</rdf:RDF>")
        }
      }
      .write.mode(SaveMode.Overwrite).text(outDir)
  }
}
