package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ingest.Fixtures
import graft.rdf.{Canon, Serialize, Turtle}

class SerializeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("json-ld sink round-trips to the same canonical triples") {
    import spark.implicits._
    val dict = Pipeline.broadcastDict(spark)
    val docs = spark.createDataset(Seq(Fixtures.doc("example5.csv")))
    val ts = Pipeline.triples(docs, dict, _ => "latin-1")
    val dir = java.nio.file.Files.createTempDirectory("jsonld").toString + "/g"
    Serialize.writeJsonLd(ts, dir, partitions = 2)
    val back = scala.collection.mutable.ArrayBuffer.empty[graft.rdf.Triple]
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".txt")).foreach { p =>
      scala.io.Source.fromFile(p, "UTF-8").getLines().foreach { line =>
        val node = graft.json.Json.parse(line).asInstanceOf[graft.json.JObj]
        val subj = "<" + node("@id").asInstanceOf[graft.json.JStr].s + ">"
        node.fields.filter(_._1 != "@id").foreach {
          case ("@type", graft.json.JArr(ts0)) =>
            ts0.foreach(t => back += graft.rdf.Triple(subj, graft.rdf.Term.RdfType,
              "<" + t.asInstanceOf[graft.json.JStr].s + ">"))
          case (pred, graft.json.JArr(vs)) =>
            vs.foreach { v =>
              val o = v.asInstanceOf[graft.json.JObj]
              val term = (o.get("@id"), o.get("@value"), o.get("@type")) match {
                case (Some(graft.json.JStr(id)), _, _) => "<" + id + ">"
                case (_, Some(graft.json.JStr(lex)), Some(graft.json.JStr(dt))) =>
                  graft.rdf.Term.typed(lex, dt)
                case (_, Some(graft.json.JStr(lex)), _) => graft.rdf.Term.lit(lex)
                case _ => fail(s"bad value $v")
              }
              back += graft.rdf.Triple(subj, "<" + pred + ">", term)
            }
          case other => fail(s"bad field $other")
        }
      }
    }
    val orig = ts.collect().map(t => graft.rdf.Triple(t.subj, t.pred, t.obj)).toSeq
    val pr = Canon.compare(back.toSeq, orig)
    assert(pr.precision == 1.0 && pr.recall == 1.0,
      s"p=${pr.precision} r=${pr.recall} missing=${pr.missing.take(3)} extra=${pr.extra.take(3)}")
  }

  test("turtle sink round-trips through the turtle reader") {
    import spark.implicits._
    val dict = Pipeline.broadcastDict(spark)
    val docs = spark.createDataset(Seq(Fixtures.doc("example5.csv")))
    val ts = Pipeline.triples(docs, dict, _ => "latin-1")
    val dir = java.nio.file.Files.createTempDirectory("ttl").toString + "/g"
    Serialize.writeTurtle(ts, dir, partitions = 3)
    val text = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.endsWith(".txt")).sorted
      .map(p => new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
      .mkString("\n")
    val back = Turtle.parse(text)
    val orig = ts.collect().map(t => graft.rdf.Triple(t.subj, t.pred, t.obj)).toSeq
    val pr = Canon.compare(back, orig)
    assert(pr.precision == 1.0 && pr.recall == 1.0,
      s"p=${pr.precision} r=${pr.recall} missing=${pr.missing.take(3)} extra=${pr.extra.take(3)}")
  }

  private def partFiles(dir: String): Seq[String] =
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".txt")).sorted.toSeq
      .map(p => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8"))

  test("trig sink round-trips per named graph") {
    import spark.implicits._
    val dict = Pipeline.broadcastDict(spark)
    val docs = spark.createDataset(Seq(
      Fixtures.doc("example2.csv"), Fixtures.doc("example5.csv")))
    val enc = Map("example2.csv" -> "utf-8", "example5.csv" -> "latin-1")
    val ts = Pipeline.triples(docs, dict, enc)
    val dir = java.nio.file.Files.createTempDirectory("trig").toString + "/g"
    Serialize.writeTriG(ts, dir, partitions = 3)
    val back = scala.collection.mutable.Map.empty[String, Vector[graft.rdf.Triple]]
    partFiles(dir).foreach { text =>
      val headerEnd = text.indexOf("\n\n")
      val header = text.substring(0, headerEnd + 2)
      var rest = text.substring(headerEnd + 2)
      while (rest.contains("{")) {
        val open = rest.indexOf("{")
        val graphIri = rest.substring(0, open).trim
        val doc = graphIri.stripPrefix("<urn:graft:doc:").stripSuffix(">")
        val close = rest.indexOf("\n}\n", open)
        val interior = rest.substring(open + 1, close + 1)
        back(doc) = back.getOrElse(doc, Vector.empty) ++
          Turtle.parse(header + interior)
        rest = rest.substring(close + 3)
      }
    }
    val orig = ts.collect().groupBy(_.doc_id)
      .map { case (d, rows) =>
        d -> rows.map(t => graft.rdf.Triple(t.subj, t.pred, t.obj)).distinct.toSeq }
    assert(back.keySet == orig.keySet)
    for ((d, want) <- orig) {
      val pr = Canon.compare(back(d), want)
      assert(pr.precision == 1.0 && pr.recall == 1.0,
        s"$d p=${pr.precision} r=${pr.recall} missing=${pr.missing.take(3)} extra=${pr.extra.take(3)}")
    }
  }

  test("hext sink round-trips per statement incl. graph lineage") {
    import spark.implicits._
    val dict = Pipeline.broadcastDict(spark)
    val docs = spark.createDataset(Seq(Fixtures.doc("example5.csv")))
    val ts = Pipeline.triples(docs, dict, _ => "latin-1")
    val dir = java.nio.file.Files.createTempDirectory("hext").toString + "/g"
    Serialize.writeHext(ts, dir)
    val back = scala.collection.mutable.ArrayBuffer.empty[(String, graft.rdf.Triple)]
    partFiles(dir).foreach { text =>
      text.linesIterator.filter(_.nonEmpty).foreach { line =>
        val graft.json.JArr(items) = graft.json.Json.parse(line): @unchecked
        val Vector(s, p, v, dt, lang, g) =
          items.map(_.asInstanceOf[graft.json.JStr].s)
        assert(lang == "")
        val obj = dt match {
          case "globalId" => "<" + v + ">"
          case d if d == graft.rdf.Term.XsdNs + "string" => graft.rdf.Term.lit(v)
          case d => graft.rdf.Term.typed(v, d)
        }
        back += ((g.stripPrefix("urn:graft:doc:"),
          graft.rdf.Triple("<" + s + ">", "<" + p + ">", obj)))
      }
    }
    val orig = ts.collect()
      .map(t => (t.doc_id, graft.rdf.Triple(t.subj, t.pred, t.obj))).toSeq
    // plain literals re-read as xsd:string-typed is the hext profile's
    // canonical form; normalize both sides the same way for compare
    def norm(tr: graft.rdf.Triple) = tr.copy(obj =
      if (tr.obj.startsWith("\"") && !tr.obj.contains("^^")) tr.obj + "^^<" + graft.rdf.Term.XsdNs + "string>"
      else tr.obj)
    def key(x: (String, graft.rdf.Triple)) = (x._1, x._2.subj, x._2.pred, x._2.obj)
    assert(back.map { case (d, tr) => (d, norm(tr)) }.sortBy(key) ==
      orig.map { case (d, tr) => (d, norm(tr)) }.sortBy(key))
  }

  test("rdf/xml sink round-trips through a DOM parse") {
    import spark.implicits._
    val dict = Pipeline.broadcastDict(spark)
    val docs = spark.createDataset(Seq(Fixtures.doc("example5.csv")))
    val ts = Pipeline.triples(docs, dict, _ => "latin-1")
    val dir = java.nio.file.Files.createTempDirectory("rdfxml").toString + "/g"
    Serialize.writeRdfXml(ts, dir, partitions = 3)
    val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val back = scala.collection.mutable.ArrayBuffer.empty[graft.rdf.Triple]
    partFiles(dir).foreach { text =>
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      val dom = dbf.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(text.getBytes("UTF-8")))
      val descs = dom.getElementsByTagNameNS(RdfNs, "Description")
      for (i <- 0 until descs.getLength) {
        val e = descs.item(i).asInstanceOf[org.w3c.dom.Element]
        val subj = "<" + e.getAttributeNS(RdfNs, "about") + ">"
        val kids = e.getChildNodes
        for (j <- 0 until kids.getLength) kids.item(j) match {
          case pe: org.w3c.dom.Element =>
            val pred = "<" + pe.getNamespaceURI + pe.getLocalName + ">"
            val obj =
              if (pe.hasAttributeNS(RdfNs, "resource"))
                "<" + pe.getAttributeNS(RdfNs, "resource") + ">"
              else if (pe.hasAttributeNS(RdfNs, "datatype"))
                graft.rdf.Term.typed(pe.getTextContent, pe.getAttributeNS(RdfNs, "datatype"))
              else graft.rdf.Term.lit(pe.getTextContent)
            back += graft.rdf.Triple(subj, pred, obj)
          case _ =>
        }
      }
    }
    val orig = ts.collect().map(t => graft.rdf.Triple(t.subj, t.pred, t.obj)).toSeq
    val pr = Canon.compare(back.toSeq, orig)
    assert(pr.precision == 1.0 && pr.recall == 1.0,
      s"p=${pr.precision} r=${pr.recall} missing=${pr.missing.take(3)} extra=${pr.extra.take(3)}")
  }
}
