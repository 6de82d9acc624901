package graft.io

import graft.core._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** SSSOM RDF (Turtle) source & sink — the reified `owl:Axiom` shape.
  *
  * Reference behavior re-expressed: `parse_sssom_rdf` (src/sssom/
  * parsers.py:384-422) and `MappingSetRDFConverter.msdf_to_rdf` /
  * `msdf_from_rdf` (src/sssom/rdf_internal.py:795-915). The reference
  * delegates to rdflib + LinkML runtime; neither exists offline, so this
  * module implements the subset of Turtle the SSSOM fixtures actually
  * use (prefix decls, blank-node property lists, datatyped literals,
  * object lists) with a driver-side recursive-descent parser — mapping
  * sets are metadata-scale documents (the reference itself materializes
  * the whole rdflib Graph in memory), while data-scale triple output
  * goes through the Parquet sinks in graft.kg.
  *
  * Shape (tests/validate_data/basic.tsv.rdf):
  * {{{
  * [] a sssom:MappingSet ;
  *     sssom:mapping_set_id "…"^^xsd:anyURI ;
  *     sssom:mappings [ a owl:Axiom ;
  *         owl:annotatedSource x:appendage ;
  *         owl:annotatedProperty owl:equivalentClass ;
  *         owl:annotatedTarget z:appendage ;
  *         sssom:confidence 8.818562e-01 ; … ] , [ … ] .
  * }}}
  */
object SssomRdf {

  // ---------- term model ----------

  sealed trait Term
  /** A resource: CURIE/pname or <IRI> (iri = true). */
  final case class Res(value: String, iri: Boolean = false) extends Term
  final case class Lit(value: String, datatype: Option[String]) extends Term
  final case class BNodeT(props: Vector[(Res, Term)]) extends Term

  // ---------- slot <-> RDF predicate mapping ----------

  /** Slots whose RDF property is NOT sssom:<slot> (LinkML slot_uri). */
  private val slotUriOverrides: Map[String, String] = Map(
    Schema.SubjectId -> "http://www.w3.org/2002/07/owl#annotatedSource",
    Schema.PredicateId -> "http://www.w3.org/2002/07/owl#annotatedProperty",
    Schema.ObjectId -> "http://www.w3.org/2002/07/owl#annotatedTarget",
    Schema.Comment -> "http://www.w3.org/2000/01/rdf-schema#comment",
    "creator_id" -> "http://purl.org/dc/terms/creator",
    "license" -> "http://purl.org/dc/terms/license",
    Schema.MappingDate -> "http://purl.org/pav/authoredOn",
    "publication_date" -> "http://purl.org/dc/terms/created",
    "see_also" -> "http://www.w3.org/2000/01/rdf-schema#seeAlso")

  private val SssomNs = "https://w3id.org/sssom/"

  private val uriToSlot: Map[String, String] =
    slotUriOverrides.map(_.swap) ++ Map(
      // alternate forms seen in reference fixtures
      "http://purl.org/dc/terms/issued" -> "publication_date")

  /** entity-type slot value <-> RDF class (reference EntityTypeConverter). */
  private val entityTypeToRes: Map[String, String] = Map(
    "owl class" -> "owl:Class",
    "owl object property" -> "owl:ObjectProperty",
    "owl data property" -> "owl:DatatypeProperty",
    "owl annotation property" -> "owl:AnnotationProperty",
    "owl named individual" -> "owl:NamedIndividual",
    "skos concept" -> "skos:Concept",
    "rdfs resource" -> "rdfs:Resource",
    "rdfs class" -> "rdfs:Class",
    "rdfs literal" -> "rdfs:Literal",
    "rdfs datatype" -> "rdfs:Datatype",
    "rdf property" -> "rdf:Property")
  private val resToEntityType = entityTypeToRes.map(_.swap)

  private val typeSlots = Set(Schema.SubjectType, Schema.ObjectType,
    Schema.PredicateType)

  private def isResourceSlot(slot: String): Boolean =
    Schema.entityReferenceSlots.contains(slot) ||
      slot == Schema.MappingJustification || slot == "curation_rule"

  // ---------- Turtle parser (driver-side; fixture-scale documents) ----------

  final class TurtleParser(s: String) {
    private var i = 0

    private def err(msg: String) =
      throw new IllegalArgumentException(
        s"turtle parse error at offset $i ('${s.slice(i, i + 20)}…'): $msg")

    private def ws(): Unit = {
      var go = true
      while (go) {
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i < s.length && s.charAt(i) == '#') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else go = false
      }
    }
    private def peek: Char = if (i < s.length) s.charAt(i) else '\u0000'
    private def expect(c: Char): Unit = {
      ws(); if (peek != c) err(s"expected '$c'"); i += 1
    }

    private def iriRef(): Res = {
      i += 1 // '<'
      val j = s.indexOf('>', i)
      if (j < 0) err("unterminated IRI")
      val v = s.substring(i, j); i = j + 1
      Res(v, iri = true)
    }

    private def stringLit(): Lit = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (peek != '"') {
        if (i >= s.length) err("unterminated string")
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => sb += other
          }
        } else sb += c
        i += 1
      }
      i += 1 // closing quote
      // optional datatype / language tag
      if (peek == '^' && i + 1 < s.length && s.charAt(i + 1) == '^') {
        i += 2
        val dt = term() match {
          case Res(v, _) => v
          case _ => err("datatype must be a resource")
        }
        Lit(sb.result(), Some(dt))
      } else if (peek == '@') {
        i += 1
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
        Lit(sb.result(), None)
      } else Lit(sb.result(), None)
    }

    private def pnameOrNumber(): Term = {
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace &&
        !",;[]()".contains(s.charAt(i))) i += 1
      var tok = s.substring(start, i)
      // a statement-final '.' binds to the statement, not the pname
      // (turtle local names cannot end with '.')
      while (tok.endsWith(".") &&
        !tok.matches("[+-]?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?")) {
        tok = tok.dropRight(1); i -= 1
      }
      if (tok.isEmpty) err("empty token")
      if (tok.matches("[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?"))
        Lit(tok, Some("http://www.w3.org/2001/XMLSchema#double"))
      else if (tok == "true" || tok == "false")
        Lit(tok, Some("http://www.w3.org/2001/XMLSchema#boolean"))
      else Res(tok)
    }

    def term(): Term = {
      ws()
      peek match {
        case '<' => iriRef()
        case '"' => stringLit()
        case '[' =>
          i += 1; ws()
          if (peek == ']') { i += 1; BNodeT(Vector.empty) }
          else {
            val props = predicateObjectList(']')
            expect(']')
            BNodeT(props)
          }
        case _ => pnameOrNumber()
      }
    }

    /** verb objectList (';' verb objectList)* — stops before `end` or '.' */
    def predicateObjectList(end: Char): Vector[(Res, Term)] = {
      val out = Vector.newBuilder[(Res, Term)]
      var go = true
      while (go) {
        ws()
        if (peek == end || peek == '.' || i >= s.length) go = false
        else {
          val verb = term() match {
            case Res("a", false) =>
              Res("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", iri = true)
            case r: Res => r
            case _ => err("verb must be a resource")
          }
          var more = true
          while (more) {
            out += verb -> term()
            ws()
            if (peek == ',') i += 1 else more = false
          }
          ws()
          if (peek == ';') { i += 1 } else go = false
        }
      }
      out.result()
    }

    /** Parse the document: prefix declarations + top-level statements. */
    def document(): (Vector[(String, String)], Vector[(Term, Vector[(Res, Term)])]) = {
      val prefixes = Vector.newBuilder[(String, String)]
      val statements = Vector.newBuilder[(Term, Vector[(Res, Term)])]
      ws()
      while (i < s.length) {
        if (s.startsWith("@prefix", i) || s.startsWith("PREFIX", i)) {
          val hasDot = s.startsWith("@prefix", i)
          i += 7 // both keywords are 7 and 6 chars; adjust below
          if (!hasDot) i -= 1
          ws()
          val start = i
          while (peek != ':') i += 1
          val p = s.substring(start, i); i += 1
          ws()
          val u = iriRef().value
          if (hasDot) expect('.')
          prefixes += p -> u
        } else if (s.startsWith("@base", i) || s.startsWith("BASE", i)) {
          err("@base not supported")
        } else {
          val subject = term()
          val props = predicateObjectList('\u0000')
          expect('.')
          statements += subject -> props
        }
        ws()
      }
      (prefixes.result(), statements.result())
    }
  }

  // ---------- read ----------

  /** Parse an SSSOM Turtle document into an Msdf. */
  def read(spark: SparkSession, path: String): Msdf = {
    val text = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8)
    readString(spark, text)
  }

  def readString(spark: SparkSession, text: String): Msdf = {
    val (prefixDecls, statements) = new TurtleParser(text).document()
    val docPrefixes = PrefixMap(prefixDecls)
    val prefixes = PrefixMap.builtIn.chain(docPrefixes)

    // built-ins-win priority: expansion goes through the chained map only
    // (document prefixes cannot shadow SSSOM built-ins like skos/owl —
    // same priority the reference enforces by rejecting redefinition)
    def expandRes(r: Res): String =
      if (r.iri) r.value else prefixes.expand(r.value).getOrElse(r.value)
    def asCurie(r: Res): String = {
      val iri = expandRes(r)
      prefixes.compress(iri).getOrElse(iri)
    }

    val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    def isType(p: Res, o: Term, cls: String): Boolean =
      expandRes(p) == RdfType && (o match {
        case r: Res => expandRes(r) == cls
        case _ => false
      })

    val setStmt = statements.find { case (_, props) =>
      props.exists { case (p, o) => isType(p, o, SssomNs + "MappingSet") }
    }.getOrElse(throw new IllegalArgumentException(
      "no sssom:MappingSet node found in RDF input"))

    // set-level metadata
    val (setSubject, setProps) = setStmt
    val metaBuilder = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    val axioms = Vector.newBuilder[Vector[(Res, Term)]]
    setProps.foreach { case (p, o) =>
      val pUri = expandRes(p)
      if (pUri == SssomNs + "mappings") o match {
        case BNodeT(props) => axioms += props
        case _ => ()
      }
      else if (pUri != RdfType) {
        val slot = uriToSlot.getOrElse(pUri,
          if (pUri.startsWith(SssomNs)) pUri.substring(SssomNs.length) else pUri)
        val value = o match {
          case r: Res => asCurie(r)
          case Lit(v, _) => v
          case _: BNodeT => ""
        }
        if (value.nonEmpty)
          metaBuilder(slot) = metaBuilder.getOrElse(slot, Vector.empty) :+ value
      }
    }
    // standard form: the set node IRI is the mapping_set_id
    setSubject match {
      case r: Res if !metaBuilder.contains("mapping_set_id") =>
        metaBuilder("mapping_set_id") = Vector(expandRes(r))
      case _ => ()
    }
    val meta: Vector[(String, MetaValue)] = metaBuilder.toVector.map {
      case (k, Vector(v)) if !Schema.multivaluedSlots.contains(k) =>
        k -> MetaString(v)
      case (k, vs) => k -> MetaList(vs)
    }

    // axioms → rows
    val rows: Vector[Map[String, Any]] = axioms.result().map { props =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Any]]
      props.foreach { case (p, o) =>
        val pUri = expandRes(p)
        if (pUri != RdfType) {
          val slot = uriToSlot.getOrElse(pUri,
            if (pUri.startsWith(SssomNs)) pUri.substring(SssomNs.length) else pUri)
          val value: Any = o match {
            case r: Res =>
              val c = asCurie(r)
              if (typeSlots.contains(slot)) resToEntityType.getOrElse(c, c)
              else if (slot == Schema.PredicateModifier &&
                c == "sssom:NegatedPredicate") Schema.PredicateModifierNot
              else c
            case Lit(v, _) if Schema.doubleSlots.contains(slot) => v.toDouble
            case Lit(v, _) => v
            case _: BNodeT => ""
          }
          m(slot) = m.getOrElse(slot, Vector.empty) :+ value
        }
      }
      m.toMap.map {
        case (k, Vector(v)) => k -> v
        // graph order = document order for our parser: round-trips keep
        // the writer's order
        case (k, vs) => k -> vs.map(String.valueOf).mkString("|")
      }
    }

    val allCols = Schema.canonicalColumnOrder(
      rows.flatMap(_.keys).distinct)
    val schema = StructType(allCols.map(c =>
      StructField(c, Schema.slotType(c), nullable = true)).toIndexedSeq)
    val data = rows.map { r =>
      Row.fromSeq(allCols.map { c =>
        r.get(c) match {
          case Some(d: Double) => d
          case Some(v) => String.valueOf(v)
          case None => if (Schema.doubleSlots.contains(c)) null else ""
        }
      })
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq), schema)
    Msdf(df, meta, prefixes).propagate()
  }

  // ---------- write ----------

  private def escape(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  private def qname(slot: String): String =
    slotUriOverrides.get(slot) match {
      case Some(uri) if uri.startsWith("http://www.w3.org/2002/07/owl#") =>
        "owl:" + uri.stripPrefix("http://www.w3.org/2002/07/owl#")
      case Some(uri) if uri.startsWith("http://www.w3.org/2000/01/rdf-schema#") =>
        "rdfs:" + uri.stripPrefix("http://www.w3.org/2000/01/rdf-schema#")
      case Some(uri) if uri.startsWith("http://purl.org/dc/terms/") =>
        "dcterms:" + uri.stripPrefix("http://purl.org/dc/terms/")
      case Some(uri) if uri.startsWith("http://purl.org/pav/") =>
        "pav:" + uri.stripPrefix("http://purl.org/pav/")
      case _ => "sssom:" + slot
    }

  private val anyUriSetSlots = Set("mapping_set_id", "license")
  private val dateSlots = Set("mapping_date", "publication_date")

  // note: predicate_modifier renders as the plain literal "Not" (both
  // reference goldens, basic.tsv.rdf:1548 / basic.tsv.owl) — the
  // sssom:NegatedPredicate resource is a legacy INPUT form the reader maps
  private def renderValue(slot: String, v: String): String =
    if (typeSlots.contains(slot))
      entityTypeToRes.getOrElse(v, "\"" + escape(v) + "\"")
    else if (isResourceSlot(slot) && PrefixMap.looksLikeCurie(v)) v
    else if (isResourceSlot(slot) && PrefixMap.looksLikeIri(v)) s"<$v>"
    else if (anyUriSetSlots.contains(slot))
      "\"" + escape(v) + "\"^^xsd:anyURI"
    else if (dateSlots.contains(slot))
      "\"" + escape(v) + "\"^^xsd:date"
    else "\"" + escape(v) + "\""

  /** Serialize to reified Turtle (reference `msdf_to_rdf`). Export edge:
    * rows are collected on the driver, like the reference's in-memory
    * rdflib Graph.
    */
  def toTurtle(msdfIn: Msdf): String = {
    // inverse of the parse-time propagate(): the reference renders the df
    // with its PHYSICAL columns — a propagatable slot that is uniform
    // across rows belongs on the set node, not on every axiom
    val msdf = msdfIn.condense()
    val sb = new StringBuilder
    sb.append(prefixBlock(msdf))
    sb.append("\n[] a sssom:MappingSet ;\n")
    metaLines(msdf, "    ").foreach(l => sb.append(l + " ;\n"))

    val cols = msdf.df.columns
    val axioms = msdf.df.collect().map { row =>
      "[ a owl:Axiom ;\n" +
        axiomSlotLines(cols, row, "            ").map(_._2)
          .mkString(" ;\n") + " ]"
    }
    if (axioms.nonEmpty)
      sb.append("    sssom:mappings " + axioms.mkString(",\n        ") + " .\n")
    else {
      sb.setLength(sb.length - 2) // drop trailing " ;\n" → close statement
      sb.append(" .\n")
    }
    sb.result()
  }

  /** Prefix declarations: document prefixes + the vocabularies the reified
    * shape uses, alphabetical.
    */
  private[io] def prefixBlock(msdf: Msdf): String = {
    val extra = Vector("xsd" -> "http://www.w3.org/2001/XMLSchema#",
      "dcterms" -> "http://purl.org/dc/terms/",
      "pav" -> "http://purl.org/pav/")
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    (msdf.prefixes.entries ++ extra).foreach { case (p, u) =>
      if (!seen.contains(p)) seen(p) = u
    }
    seen.toVector.sortBy(_._1)
      .map { case (p, u) => s"@prefix $p: <$u> .\n" }.mkString
  }

  /** Rendered set-metadata lines (no trailing separators), qname-sorted. */
  private[io] def metaLines(msdf: Msdf, indent: String): Seq[String] =
    msdf.meta.filterNot(_._1 == "curie_map").sortBy(m => qname(m._1))
      .flatMap {
        case (k, MetaString(v)) if v.nonEmpty =>
          Seq(s"$indent${qname(k)} ${renderValue(k, v)}")
        case (k, MetaList(vs)) if vs.nonEmpty =>
          Seq(s"$indent${qname(k)} " +
            vs.map(renderValue(k, _)).mkString(",\n" + indent + "    "))
        case _ => Seq.empty
      }

  /** Rendered (slot, line) pairs of one mapping row's reified-axiom body,
    * line-sorted; multivalued slots split, empty/null/non-finite skipped.
    */
  private[io] def axiomSlotLines(cols: Array[String],
      row: org.apache.spark.sql.Row, indent: String): Seq[(String, String)] = {
    val slotVals = cols.indices.flatMap { ci =>
      val slot = cols(ci)
      row.get(ci) match {
        case null => Seq.empty
        // NaN/Infinity have no Turtle numeric-literal syntax — under the
        // column null discipline a non-finite score is absent, not a token
        case d: Double if d.isNaN || d.isInfinite => Seq.empty
        // shortest-round-trip repr (valid turtle double/decimal syntax):
        // unlike rdflib's %e it loses no precision on re-parse
        case d: Double => Seq(slot -> d.toString)
        case v: String if v.isEmpty => Seq.empty
        case v: String if Schema.multivaluedSlots.contains(slot) =>
          v.split("\\|").toSeq.filter(_.nonEmpty).map(slot -> _)
        case v => Seq(slot -> v.toString)
      }
    }
    slotVals
      .map { case (slot, v) =>
        val rendered =
          if (Schema.doubleSlots.contains(slot)) v // already formatted
          else renderValue(slot, v)
        slot -> s"$indent${qname(slot)} $rendered"
      }
      .sortBy(_._2)
  }

  private[io] def slotQName(slot: String): String = qname(slot)
  private[io] def renderSlotValue(slot: String, v: String): String =
    renderValue(slot, v)

  def write(msdf: Msdf, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, toTurtle(msdf).getBytes(StandardCharsets.UTF_8))
  }
}
