package graft.io

import graft.SparkSpec
import graft.core._
import graft.ops.{SqlOps, TripleEmit, Validators}
import org.apache.spark.sql.functions._

class JsonXmlSpec extends SparkSpec {

  test("SSSOM-JSON parse: 141 mappings with typed confidence (basic.json)") {
    val msdf = SssomJson.readJson(spark, fixture("basic.json"))
    assert(msdf.df.count() == 141)
    assert(msdf.df.schema("confidence").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(msdf.metaMap("mapping_set_id").asString
      == "https://w3id.org/sssom/mapping/tests/data/basic.tsv")
    // document @context prefixes are chained after the built-ins
    // (reference parse_sssom_json priority order, parsers.py:443-454)
    assert(msdf.prefixes.contains("Orphanet"))
    assert(msdf.prefixes.expand("Orphanet:1234")
      .contains("http://www.orpha.net/ORDO/Orphanet_1234"))
    assert(msdf.prefixes.contains("oboInOwl"))
    // built-ins still win on conflicts
    assert(msdf.prefixes.expand("owl:equivalentClass")
      .contains("http://www.w3.org/2002/07/owl#equivalentClass"))
  }

  test("SSSOM-JSON round trip") {
    val msdf = SssomJson.readJson(spark, fixture("basic.json"))
    val out = java.nio.file.Files.createTempDirectory("json").toString + "/rt.json"
    SssomJson.writeJson(msdf, out)
    val back = SssomJson.readJson(spark, out)
    assert(back.df.count() == 141)
  }

  test("Alignment XML parse: 646 cells (reference tests/test_parsers.py:214)") {
    val msdf = SssomJson.readAlignmentXml(spark, fixture("oaei-ordo-hp.rdf"),
      PrefixMap.builtIn.chain(PrefixMap(Vector(
        "Orphanet" -> "http://www.orpha.net/ORDO/Orphanet_",
        "HP" -> "http://purl.obolibrary.org/obo/HP_"))))
    assert(msdf.df.count() == 646)
    assert(msdf.df.filter(col("subject_id").startsWith("Orphanet:")).count() == 646)
    assert(msdf.df.filter(col("confidence").isNull).count() == 0)
  }

  test("OBO Graphs parse extracts xref mappings with labels (hp-subset.json)") {
    val msdf = SssomJson.readObographs(spark, fixture("hp-subset.json"),
      PrefixMap.builtIn.chain(PrefixMap(Vector(
        "HP" -> "http://example/obo/HP_",
        "UMLS" -> "http://example/umls/",
        "SNOMEDCT_US" -> "http://example/sct/"))))
    assert(msdf.df.count() > 0)
    assert(msdf.df.filter(col("predicate_id") === "oboInOwl:hasDbXref").count() > 0)
    // labels joined from the node table
    assert(msdf.df.filter(col("subject_label") =!= "").count() > 0)
  }

  test("OBO Graphs parse covers basicPropertyValues, edges and equivalents") {
    val prefixes = PrefixMap.builtIn.chain(PrefixMap(Vector(
      "HP" -> "http://example/obo/HP_",
      "UMLS" -> "http://example/umls/",
      "SCT" -> "http://example/sct/")))
    // default predicates: xref(1) + skos bpv(1) + broadMatch edge(1) +
    // equivalent pair(2); is_a and non-mapping preds excluded
    val msdf = SssomJson.readObographs(spark, fixture("obographs-mixed.json"),
      prefixes)
    assert(msdf.df.count() == 5)
    val byPred = msdf.df.groupBy("predicate_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPred == Map("oboInOwl:hasDbXref" -> 1L, "skos:exactMatch" -> 1L,
      "skos:broadMatch" -> 1L, "owl:equivalentClass" -> 2L))
    // the non-mapping basicPropertyValue (hasOBONamespace) is excluded
    assert(msdf.df.filter(col("object_id") === "human_phenotype").count() == 0)
    // labels attach on both sides of edge-derived mappings
    assert(msdf.df.filter(col("predicate_id") === "skos:broadMatch" &&
      col("subject_label") === "Child" && col("object_label") === "SCT One")
      .count() == 1)

    // asking for rdfs:subClassOf surfaces the is_a edge, translated
    // (reference _get_obographs_predicate_id, parsers.py:734-737)
    val withIsA = SssomJson.readObographs(spark, fixture("obographs-mixed.json"),
      prefixes,
      SssomJson.defaultMappingPredicates :+ "rdfs:subClassOf")
    assert(withIsA.df.count() == 6)
    assert(withIsA.df.filter(col("predicate_id") === "rdfs:subClassOf" &&
      col("subject_id") === "HP:0000002" &&
      col("object_id") === "HP:0000001").count() == 1)
  }

  test("FHIR / Ontoportal export emit valid JSON with expanded IRIs") {
    val msdf = SssomTsv.read(spark, fixture("basic3.tsv"))
    val fhir = SssomJson.toFhirJson(msdf)
    assert(fhir.contains("\"resourceType\" : \"ConceptMap\""))
    assert(fhir.contains("\"equivalence\" : \"equivalent\""))
    val op = SssomJson.toOntoportalJson(msdf)
    assert(op.contains("http://example.org/a/something"))
    assert(op.contains("http://www.w3.org/2002/07/owl#equivalentClass"))
  }
}

/** BASELINE P/R gate: emitted (s,p,o) triples vs the reference's golden
  * conversion output (tests/validate_data/basic.tsv.rdf — the owl:Axiom
  * reifications carry the reference's triple set).
  */
class TriplePrecisionRecallSpec extends SparkSpec {

  private def goldenTriples(path: String): Set[(String, String, String)] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val rx = ("""owl:annotatedProperty\s+(\S+)\s*;[\s\S]*?""" +
      """owl:annotatedSource\s+(\S+)\s*;[\s\S]*?""" +
      """owl:annotatedTarget\s+(\S+)\s*;""").r
    rx.findAllMatchIn(txt).map(m => (m.group(2), m.group(1), m.group(3))).toSet
  }

  test("triple P/R vs reference golden ≥ 0.95 (BASELINE.json metric)") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val ours = TripleEmit.emit(msdf.df, msdf.prefixes, expand = false)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    val golden = goldenTriples(fixture("golden_basic.ttl"))
    val common = (ours & golden).size.toDouble
    val precision = common / ours.size
    val recall = common / golden.size
    info(f"precision=$precision%.4f recall=$recall%.4f " +
      f"(ours=${ours.size} golden=${golden.size})")
    assert(precision >= 0.95, s"precision $precision < 0.95")
    assert(recall >= 0.95, s"recall $recall < 0.95")
  }

  test("validators: basic.tsv is clean; piped CURIEs are flagged") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val report = Validators.validate(msdf)
    assert(report.curieFormatViolations == 0)
    assert(report.schemaViolations == 0)
    // bad-attribute counter (reference parsers.py:530-552)
    assert(Validators.badAttributeCounts(msdf.df).isEmpty)
    val withBad = msdf.df.withColumn("not_a_slot", lit("x"))
    assert(Validators.badAttributeCounts(withBad) == Map("not_a_slot" -> 141L))
    val bad = msdf.df.limit(2).withColumn("subject_id",
      concat(col("subject_id"), lit("|x:evil")))
    assert(Validators.strictCurieViolations(bad).count() == 2)
  }

  test("dosql runs arbitrary SQL over registered mapping sets") {
    val b3 = SssomTsv.read(spark, fixture("basic3.tsv"))
    val b7 = SssomTsv.read(spark, fixture("basic7.tsv"))
    val joined = SqlOps.dosql(spark,
      """SELECT df1.subject_id, df2.object_id FROM df1
        |JOIN df2 ON df1.object_id = df2.subject_id""".stripMargin,
      Map("basic3" -> b3.df, "basic7" -> b7.df))
    assert(joined.count() > 0)
  }

  test("split by prefix×predicate×prefix partitions the table completely") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val parts = SqlOps.splitDataframe(msdf.df)
    assert(parts.nonEmpty)
    assert(parts.values.map(_.count()).sum == 141)
    assert(parts.keySet.exists(_.startsWith("x_")))
  }

  test("chi² over crosstab is positive and finite") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val chi = SqlOps.chiSquared(msdf.df, "predicate_id", "mapping_justification")
    assert(chi >= 0.0 && !chi.isNaN && !chi.isInfinite)
  }

  test("annotate merges multivalued metadata with set-union") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val annotated = SqlOps.annotate(msdf,
      Map("creator_id" -> Seq("orcid:9999", "orcid:1234")))
    assert(annotated.metaMap("creator_id").asString ==
      "orcid:1234|orcid:5678|orcid:9999")
  }

  test("enforceVersion(1.0) drops 1.1-only slots") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val withNew = msdf.withDf(msdf.df.withColumn("predicate_type",
      lit("owl object property")))
    val enforced = SqlOps.enforceVersion(withNew)
    assert(!enforced.df.columns.contains("predicate_type"))
  }
}
