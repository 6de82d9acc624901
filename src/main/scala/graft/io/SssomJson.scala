package graft.io

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-family sources & sinks.
  *
  *  - SSSOM-JSON parse (reference `parse_sssom_json`, src/sssom/parsers.py:
  *    425-459): one JSON document with set-level slots + `mappings` array →
  *    distributed explode.
  *  - OBO Graphs parse (reference `from_obographs`, parsers.py:740-820):
  *    xrefs / basicPropertyValues / edges / equivalentNodesSets (pairwise
  *    product via self-join) → mapping rows, labels attached by join.
  *  - Alignment-API XML parse (reference `parse_alignment_xml`,
  *    parsers.py:555-576): driver-side DOM over the (small) alignment file.
  *  - SSSOM-JSON write (reference `to_json`, writers.py:598-604), FHIR
  *    ConceptMap (writers.py:401-582) and Ontoportal (writers.py:607-638)
  *    sinks: per-row JSON objects built distributively, document assembly
  *    at the driver edge.
  */
object SssomJson {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---------- SSSOM-JSON ----------

  def readJson(spark: SparkSession, path: String): Msdf = {
    val doc = spark.read.option("multiLine", "true").json(path)
    val prefixCols = Set("@context", "curie_map")
    val setCols = doc.columns.filterNot(c => c == "mappings" || prefixCols(c))
    // set-level slots → metadata (single row, driver-side)
    val metaRow = doc.select(setCols.map(col): _*).collect()(0)
    val meta = setCols.zipWithIndex.flatMap { case (c, i) =>
      Option(metaRow.get(i)).map {
        case s: scala.collection.Seq[_] =>
          c -> MetaList(s.map(String.valueOf).toVector)
        case other => c -> MetaString(String.valueOf(other))
      }
    }.toVector
    // document-internal prefix map (JSON-LD @context and/or curie_map key),
    // chained AFTER the built-in map — reference priority order
    // (parsers.py:443-454): built-in, then document-internal
    val docPrefixEntries: Vector[(String, String)] = doc.columns
      .filter(prefixCols)
      .flatMap { c =>
        doc.select(col(c)).collect()(0).get(0) match {
          case r: org.apache.spark.sql.Row =>
            r.schema.fields.toVector.flatMap { f =>
              r.getAs[Any](f.name) match {
                case s: String => Some(f.name -> s)
                // JSON-LD expanded term definition {"@id": ..., "@prefix": true}
                case inner: org.apache.spark.sql.Row
                    if inner.schema.fieldNames.contains("@id") =>
                  Option(inner.getAs[String]("@id")).map(f.name -> _)
                case _ => None
              }
            }
          case _ => Vector.empty
        }
      }
      .toVector
      .filterNot { case (p, _) => p.startsWith("@") }
    val prefixes = PrefixMap.builtIn.chain(PrefixMap(docPrefixEntries))

    val rows = doc.select(explode(col("mappings")).as("m")).select("m.*")
    // "" discipline + double typing, as in the TSV reader
    val stringified = rows.select(rows.columns.map { c =>
      if (Schema.doubleSlots.contains(c)) col(c).cast(DoubleType).as(c)
      else coalesce(col(c).cast(StringType), lit("")).as(c)
    }.toIndexedSeq: _*)
    Msdf(stringified, meta, prefixes)
  }

  /** Serialize to a single SSSOM-JSON document (export edge — the row set
    * is collected; for data-scale output use the Parquet sinks).
    */
  def writeJson(msdf: Msdf, path: String): Unit = {
    val root = om.createObjectNode()
    msdf.meta.foreach {
      case (k, MetaString(v)) => root.put(k, v)
      case (k, MetaList(vs)) =>
        val arr = root.putArray(k); vs.foreach(arr.add)
      case (k, MetaMap(m)) =>
        val o = root.putObject(k); m.foreach { case (a, b) => o.put(a, b) }
    }
    val cm = root.putObject("curie_map")
    msdf.prefixes.entries.sortBy(_._1).foreach { case (p, u) => cm.put(p, u) }
    val arr = root.putArray("mappings")
    val cols = msdf.df.columns
    msdf.df.collect().foreach { row =>
      val o = arr.addObject()
      cols.indices.foreach { i =>
        row.get(i) match {
          case null | "" => ()
          case d: Double => o.put(cols(i), d)
          case v => o.put(cols(i), v.toString)
        }
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      om.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
  }

  // ---------- OBO Graphs ----------

  /** Default mapping predicates (reference DEFAULT_MAPPING_PROPERTIES,
    * constants.py:47-55).
    */
  val defaultMappingPredicates: Seq[String] = Seq(
    "http://www.w3.org/2004/02/skos/core#exactMatch",
    "http://www.w3.org/2004/02/skos/core#closeMatch",
    "http://www.w3.org/2004/02/skos/core#broadMatch",
    "http://www.w3.org/2004/02/skos/core#narrowMatch",
    "http://www.geneontology.org/formats/oboInOwl#hasDbXref",
    "http://www.w3.org/2004/02/skos/core#relatedMatch",
    "http://www.w3.org/2002/07/owl#equivalentClass")

  def readObographs(spark: SparkSession, path: String,
      prefixes: PrefixMap,
      mappingPredicates: Seq[String] = defaultMappingPredicates): Msdf = {
    val doc = spark.read.option("multiLine", "true").json(path)
    require(doc.columns.contains("graphs"),
      s"No graphs element in obographs file $path — wrong format?")
    val graphs = doc.select(explode(col("graphs")).as("g"))
    val hasNodes = graphs.select("g.*").columns.contains("nodes")
    val nodes =
      if (hasNodes) graphs.select(explode(col("g.nodes")).as("n")).select("n.*")
      else spark.emptyDataFrame

    val bc = spark.sparkContext.broadcast(prefixes)
    val compress = udf((v: String) =>
      if (v == null) null else bc.value.standardize(v))

    def colOpt(df: DataFrame, c: String): Boolean = df.columns.contains(c)

    // label table for the join-based label attach
    val labels =
      if (hasNodes && colOpt(nodes, "lbl"))
        nodes.select(compress(col("id")).as("lid"), col("lbl"))
          .filter(col("lbl").isNotNull)
      else spark.emptyDataFrame.withColumn("lid", lit(""))
        .withColumn("lbl", lit(""))

    val xrefPred = "http://www.geneontology.org/formats/oboInOwl#hasDbXref"
    val xrefs =
      if (hasNodes && colOpt(nodes, "meta") &&
        mappingPredicates.contains(xrefPred) &&
        nodes.select("meta.*").columns.contains("xrefs"))
        nodes.select(compress(col("id")).as(Schema.SubjectId),
          lit("oboInOwl:hasDbXref").as(Schema.PredicateId),
          explode(col("meta.xrefs")).as("x"))
          .withColumn(Schema.ObjectId, compress(col("x.val"))).drop("x")
      else null

    // basicPropertyValues: {pred, val} pairs on node meta; kept when the
    // raw pred URI is a mapping predicate (reference parsers.py:791-796)
    val bpvs =
      if (hasNodes && colOpt(nodes, "meta") &&
        nodes.select("meta.*").columns.contains("basicPropertyValues"))
        nodes.select(col("id"), explode(col("meta.basicPropertyValues")).as("v"))
          .filter(col("v.pred").isin(mappingPredicates: _*))
          .select(compress(col("id")).as(Schema.SubjectId),
            compress(col("v.pred")).as(Schema.PredicateId),
            compress(col("v.val")).as(Schema.ObjectId))
      else null

    // edges: {sub, pred, obj}; `is_a` means rdfs:subClassOf (reference
    // _get_obographs_predicate_id, parsers.py:734-737); the filter applies
    // AFTER translation, so subClassOf edges surface only when the caller
    // asks for "rdfs:subClassOf" in mappingPredicates (reference
    // parsers.py:798-803)
    val edges =
      if (graphs.select("g.*").columns.contains("edges")) {
        val e = graphs.select(explode(col("g.edges")).as("e")).select("e.*")
        e.withColumn("__pred",
          when(col("pred") === "is_a", lit(Schema.RdfsSubclassOf))
            .otherwise(col("pred")))
          .filter(col("__pred").isin(mappingPredicates: _*))
          .select(compress(col("sub")).as(Schema.SubjectId),
            compress(col("__pred")).as(Schema.PredicateId),
            compress(col("obj")).as(Schema.ObjectId))
      } else null

    val equivPred = "http://www.w3.org/2002/07/owl#equivalentClass"
    val equivs =
      if (mappingPredicates.contains(equivPred) &&
        graphs.select("g.*").columns.contains("equivalentNodesSets")) {
        val sets = graphs
          .select(monotonically_increasing_id().as("gid"),
            explode(col("g.equivalentNodesSets")).as("s"))
          .select(concat(col("gid"), lit("_"),
            monotonically_increasing_id()).as("sid"),
            col("s.nodeIds").as("ids"))
        val members = sets.select(col("sid"), explode(col("ids")).as("uri"))
        // pairwise product via self-join on the set id (reference itt.product)
        members.as("a").join(members.as("b"), Seq("sid"))
          .filter(col("a.uri") =!= col("b.uri"))
          .select(compress(col("a.uri")).as(Schema.SubjectId),
            lit(Schema.OwlEquivalentClass).as(Schema.PredicateId),
            compress(col("b.uri")).as(Schema.ObjectId))
      } else null

    val parts = Seq(Option(xrefs), Option(bpvs), Option(edges),
      Option(equivs)).flatten
    require(parts.nonEmpty, "no mapping-bearing elements in obographs input")
    val mappings0 = parts.reduce(_ unionByName _)
      .withColumn(Schema.MappingJustification,
        lit(Schema.JustificationUnspecified))

    // attach labels by join on both sides
    val withSubjLabel = mappings0
      .join(labels.withColumnRenamed("lid", Schema.SubjectId)
        .withColumnRenamed("lbl", Schema.SubjectLabel),
        Seq(Schema.SubjectId), "left")
    val withLabels = withSubjLabel
      .join(labels.withColumnRenamed("lid", Schema.ObjectId)
        .withColumnRenamed("lbl", Schema.ObjectLabel),
        Seq(Schema.ObjectId), "left")
    val filled = withLabels.select(withLabels.columns.map { c =>
      if (Schema.doubleSlots.contains(c)) col(c)
      else coalesce(col(c), lit("")).as(c)
    }.toIndexedSeq: _*)
      .filter(col(Schema.SubjectId) =!= "" && col(Schema.ObjectId) =!= "")
    Msdf(filled, Vector.empty, prefixes)
  }

  // ---------- Alignment-API XML ----------

  /** relation symbol → predicate (reference parsers.py:946-961). */
  private val relationMap = Map(
    "=" -> Schema.OwlEquivalentClass,
    "<" -> Schema.RdfsSubclassOf,
    ">" -> "inverseOf(rdfs:subClassOf)",
    "HasInstance" -> "rdf:type")

  def readAlignmentXml(spark: SparkSession, path: String,
      prefixes: PrefixMap): Msdf = {
    import scala.jdk.CollectionConverters._
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder().parse(new java.io.File(path))
    val cells = doc.getElementsByTagName("Cell")
    val rows = (0 until cells.getLength).flatMap { i =>
      val cell = cells.item(i).asInstanceOf[org.w3c.dom.Element]
      def res(tag: String): Option[String] = {
        val nl = cell.getElementsByTagName(tag)
        if (nl.getLength == 0) None
        else {
          val e = nl.item(0).asInstanceOf[org.w3c.dom.Element]
          Option(e.getAttribute("rdf:resource")).filter(_.nonEmpty)
            .orElse(Option(e.getTextContent).map(_.trim).filter(_.nonEmpty))
        }
      }
      def text(tag: String): Option[String] = {
        val nl = cell.getElementsByTagName(tag)
        if (nl.getLength == 0) None
        else Option(nl.item(0).getTextContent).map(_.trim)
      }
      for {
        e1 <- res("entity1"); e2 <- res("entity2")
        rel <- text("relation")
      } yield (prefixes.standardize(e1),
        relationMap.getOrElse(rel, Schema.OwlEquivalentClass),
        prefixes.standardize(e2),
        text("measure").flatMap(m => scala.util.Try(m.toDouble).toOption))
    }
    import spark.implicits._
    val df = rows.toDF(Schema.SubjectId, Schema.PredicateId, Schema.ObjectId,
      Schema.Confidence)
      .withColumn(Schema.MappingJustification,
        lit(Schema.JustificationUnspecified))
    Msdf(df, Vector.empty, prefixes)
  }

  // ---------- FHIR / Ontoportal export ----------

  /** FHIR ConceptMap equivalence per predicate (reference writers.py:442-470
    * mapping table).
    */
  private val fhirEquivalence = Map(
    Schema.OwlEquivalentClass -> "equivalent",
    Schema.SkosExactMatch -> "equivalent",
    Schema.SkosCloseMatch -> "relatedto",
    Schema.SkosBroadMatch -> "wider",
    Schema.SkosNarrowMatch -> "narrower",
    Schema.OboHasDbXref -> "relatedto",
    Schema.SkosRelatedMatch -> "relatedto")

  /** FHIR ConceptMap JSON (export edge; per-row elements computed
    * distributively, document assembled on the driver).
    */
  def toFhirJson(msdf: Msdf): String = {
    val eq = typedLit(fhirEquivalence)
    val rows = msdf.df.select(
      col(Schema.SubjectId), col(Schema.ObjectId),
      coalesce(element_at(eq, col(Schema.PredicateId)),
        lit("relatedto")).as("equivalence"),
      (if (msdf.df.columns.contains(Schema.SubjectLabel))
        col(Schema.SubjectLabel) else lit("")).as("display"))
      .collect()
    val root = om.createObjectNode()
    root.put("resourceType", "ConceptMap")
    msdf.metaMap.get("mapping_set_id").foreach(v => root.put("url", v.asString))
    val group = root.putArray("group").addObject()
    val elems = group.putArray("element")
    rows.foreach { r =>
      val e = elems.addObject()
      e.put("code", r.getString(0))
      if (r.getString(3).nonEmpty) e.put("display", r.getString(3))
      val t = e.putArray("target").addObject()
      t.put("code", r.getString(1))
      t.put("equivalence", r.getString(2))
    }
    om.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Ontoportal JSON array (reference writers.py:607-638): per-row objects
    * with IRI-expanded classes/relation.
    */
  def toOntoportalJson(msdf: Msdf): String = {
    val bc = msdf.df.sparkSession.sparkContext.broadcast(msdf.prefixes)
    val expand = udf((v: String) => bc.value.expandOrSelf(v))
    val rows = msdf.df.select(
      expand(col(Schema.SubjectId)).as("s"),
      expand(col(Schema.PredicateId)).as("p"),
      expand(col(Schema.ObjectId)).as("o"),
      (if (msdf.df.columns.contains("mapping_justification"))
        col("mapping_justification") else lit("")).as("j"))
      .collect()
    val arr = om.createArrayNode()
    rows.foreach { r =>
      val o = arr.addObject()
      val cls = o.putArray("classes")
      cls.add(r.getString(0)); cls.add(r.getString(2))
      o.putArray("relation").add(r.getString(1))
      if (r.getString(3).nonEmpty) o.put("source", r.getString(3))
    }
    om.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
  }
}
