package graft.io

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.functions._

class SssomRdfSpec extends SparkSpec {

  private def tripleSet(df: org.apache.spark.sql.DataFrame)
      : Set[(String, String, String)] =
    df.select("subject_id", "predicate_id", "object_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("RDF parse: golden_basic.ttl yields the reference's 141 mappings") {
    val msdf = SssomRdf.read(spark, fixture("golden_basic.ttl"))
    assert(msdf.df.count() == 141)
    assert(msdf.metaMap("mapping_set_id").asString ==
      "https://w3id.org/sssom/mapping/tests/data/basic.tsv")
    assert(msdf.metaMap("license").asString ==
      "https://creativecommons.org/publicdomain/zero/1.0/")
    // multivalued creator_id from repeated dcterms:creator triples
    assert(msdf.metaMap("creator_id") == MetaList(Vector("orcid:1234", "orcid:5678")))
    // mapping_date is propagatable: propagate() moved it to a row column
    assert(msdf.df.filter(col("mapping_date") === "2020-05-30").count() == 141)
    assert(msdf.df.schema("confidence").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // triple set matches the TSV source of the golden file
    val tsv = SssomTsv.read(spark, fixture("basic.tsv"))
    val rdfTriples = tripleSet(msdf.df)
    val tsvTriples = tripleSet(tsv.df)
    val common = (rdfTriples & tsvTriples).size.toDouble
    assert(common / rdfTriples.size >= 0.95)
    assert(common / tsvTriples.size >= 0.95)
  }

  test("RDF parse: standard node-IRI form with typed slots") {
    val msdf = SssomRdf.readString(spark,
      """@prefix ORGENT: <https://example.org/entities/> .
        |@prefix COMENT: <https://example.com/entities/> .
        |@prefix dcterms: <http://purl.org/dc/terms/> .
        |@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix semapv: <https://w3id.org/semapv/vocab/> .
        |@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
        |@prefix sssom: <https://w3id.org/sssom/> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |
        |<https://example.org/sets/standard-rdf> a sssom:MappingSet;
        |  dcterms:license <https://creativecommons.org/licenses/by/4.0/>;
        |  sssom:mappings [ a owl:Axiom;
        |      owl:annotatedProperty skos:closeMatch;
        |      owl:annotatedSource ORGENT:0001;
        |      owl:annotatedTarget COMENT:0011;
        |      sssom:confidence 7.0E-1;
        |      sssom:mapping_justification semapv:ManualMappingCuration;
        |      sssom:object_label "alpha";
        |      sssom:predicate_modifier sssom:NegatedPredicate;
        |      sssom:subject_type owl:Class
        |    ] .
        |""".stripMargin)
    assert(msdf.df.count() == 1)
    // node IRI becomes the mapping_set_id
    assert(msdf.metaMap("mapping_set_id").asString ==
      "https://example.org/sets/standard-rdf")
    val row = msdf.df.collect()(0)
    def v(c: String) = row.getString(row.fieldIndex(c))
    assert(v("subject_id") == "ORGENT:0001")
    assert(v("predicate_id") == "skos:closeMatch")
    assert(v("object_id") == "COMENT:0011")
    assert(row.getDouble(row.fieldIndex("confidence")) == 0.7)
    assert(v("predicate_modifier") == "Not")
    assert(v("subject_type") == "owl class")
    assert(v("mapping_justification") == "semapv:ManualMappingCuration")
  }

  test("round trip tsv -> rdf -> msdf preserves triples, slots and metadata") {
    val tsv = SssomTsv.read(spark, fixture("basic.tsv"))
    val out = java.nio.file.Files.createTempDirectory("rdf").toString + "/rt.ttl"
    SssomRdf.write(tsv, out)
    val back = SssomRdf.read(spark, out)
    assert(back.df.count() == tsv.df.count())
    assert(tripleSet(back.df) == tripleSet(tsv.df))
    // slot values survive: labels, comment, confidence (to %e precision)
    val origLabels = tsv.df.select("subject_id", "subject_label").distinct()
    val backLabels = back.df.select("subject_id", "subject_label").distinct()
    assert(origLabels.exceptAll(backLabels).count() == 0)
    def confRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("subject_id"), col("predicate_id"), col("object_id"),
        col("confidence"))
    assert(confRows(tsv.df).exceptAll(confRows(back.df)).count() == 0,
      "confidence must round-trip bit-exact")
    assert(back.metaMap("mapping_set_id") == tsv.metaMap("mapping_set_id"))
    assert(back.metaMap("license") == tsv.metaMap("license"))
  }

  test("our writer's output passes the golden P/R gate shape (regex-extractable)") {
    val tsv = SssomTsv.read(spark, fixture("basic.tsv"))
    val ttl = SssomRdf.toTurtle(tsv)
    val rx = ("""owl:annotatedProperty\s+(\S+)\s*;[\s\S]*?""" +
      """owl:annotatedSource\s+(\S+)\s*;[\s\S]*?""" +
      """owl:annotatedTarget\s+(\S+)\s*;""").r
    val extracted = rx.findAllMatchIn(ttl)
      .map(m => (m.group(2), m.group(1), m.group(3))).toSet
    assert(extracted == tripleSet(tsv.df))
  }
}
