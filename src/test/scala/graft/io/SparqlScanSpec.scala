package graft.io

import graft.SparkSpec
import graft.core.PrefixMap
import graft.io.SparqlScan.EndpointConfig

class SparqlScanSpec extends SparkSpec {

  private val prefixes = PrefixMap.builtIn.chain(PrefixMap(Vector(
    "HP" -> "http://purl.obolibrary.org/obo/HP_",
    "MP" -> "http://purl.obolibrary.org/obo/MP_",
    "g" -> "http://example.org/graphs/")))

  test("buildQuery mirrors the reference scan (sparql_util.py:43-77)") {
    val q = SparqlScan.buildQuery(EndpointConfig(url = "http://e/sparql"))
    // default predicates, all-graphs scan, provider bind, no limit
    assert(q.contains("VALUES ?predicate_id { " +
      "<http://www.w3.org/2004/02/skos/core#exactMatch> " +
      "<http://www.w3.org/2004/02/skos/core#closeMatch> }"))
    assert(q.contains("GRAPH ?g {"))
    assert(q.contains("BIND(?g as ?mapping_provider)"))
    assert(q.contains("SELECT ?subject_id ?subject_label ?predicate_id " +
      "?object_id ?mapping_provider"))
    assert(!q.contains("LIMIT"))
    assert(!q.contains("OPTIONAL"))

    val q2 = SparqlScan.buildQuery(EndpointConfig(url = "http://e/sparql",
      graph = Some("http://example.org/graphs/m"), prefixes = prefixes,
      predicates = Some(Seq("skos:broadMatch")), limit = Some(50L),
      includeObjectLabels = true))
    assert(q2.contains("GRAPH <http://example.org/graphs/m> {"))
    assert(q2.contains(
      "VALUES ?predicate_id { <http://www.w3.org/2004/02/skos/core#broadMatch> }"))
    assert(q2.contains("OPTIONAL { ?object_id rdfs:label ?object_label }"))
    assert(q2.contains("?object_label ?mapping_provider"))
    assert(q2.contains("LIMIT 50"))
    // unexpandable predicate CURIEs raise (reference expand_strict)
    intercept[IllegalArgumentException] {
      SparqlScan.buildQuery(EndpointConfig(url = "u",
        predicates = Some(Seq("nope:xx"))))
    }
  }

  test("queryMappings shapes bindings into a compressed Msdf") {
    val bindings = Seq(
      Map("subject_id" -> "http://purl.obolibrary.org/obo/HP_0000001",
        "subject_label" -> "All",
        "predicate_id" -> "http://www.w3.org/2004/02/skos/core#exactMatch",
        "object_id" -> "http://purl.obolibrary.org/obo/MP_0000001",
        "mapping_provider" -> "http://example.org/graphs/m"),
      // OPTIONAL object_label absent in this row
      Map("subject_id" -> "http://purl.obolibrary.org/obo/HP_0000002",
        "subject_label" -> "Two",
        "predicate_id" -> "http://www.w3.org/2004/02/skos/core#closeMatch",
        "object_id" -> "http://purl.obolibrary.org/obo/MP_0000002",
        "mapping_provider" -> "http://example.org/graphs/m"))
    var seenQuery: String = null
    val msdf = SparqlScan.queryMappings(spark,
      EndpointConfig(url = "http://e/sparql", prefixes = prefixes),
      executor = Some(q => { seenQuery = q; bindings }))
    assert(seenQuery.contains("VALUES ?predicate_id"))
    val rows = msdf.df.collect().map(r => (r.getString(0), r.getString(2),
      r.getString(3), r.getString(4))).toSet
    assert(rows == Set(
      ("HP:0000001", "skos:exactMatch", "MP:0000001", "g:m"),
      ("HP:0000002", "skos:closeMatch", "MP:0000002", "g:m")))
    // offline default: documented error, same pattern as the TSV fetcher
    val err = intercept[UnsupportedOperationException] {
      SparqlScan.queryMappings(spark, EndpointConfig(url = "http://e/sparql"))
    }
    assert(err.getMessage.contains("offline"))
  }

  test("absent OPTIONAL bindings are null; uncompressible IRIs raise " +
      "(reference safe_compress strict=True)") {
    val full = Map("subject_id" -> "http://purl.obolibrary.org/obo/HP_0000001",
      "subject_label" -> "All",
      "predicate_id" -> "http://www.w3.org/2004/02/skos/core#exactMatch",
      "object_id" -> "http://purl.obolibrary.org/obo/MP_0000001",
      "mapping_provider" -> "http://example.org/graphs/m")
    val msdf = SparqlScan.queryMappings(spark,
      EndpointConfig(url = "http://e/sparql", prefixes = prefixes,
        includeObjectLabels = true),
      // object_label matched in row 1, absent (unmatched OPTIONAL) in row 2
      executor = Some(_ => Seq(full + ("object_label" -> "One"),
        full + ("subject_id" -> "http://purl.obolibrary.org/obo/HP_0000002"))))
    val byId = msdf.df.collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(byId("HP:0000001") == "One")
    assert(byId("HP:0000002") == null) // pandas-NaN parity, not ""
    // an endpoint emitting IRIs outside the prefix map is an error, not a
    // silently different Msdf
    intercept[IllegalArgumentException] {
      SparqlScan.queryMappings(spark,
        EndpointConfig(url = "http://e/sparql", prefixes = prefixes),
        executor = Some(_ => Seq(
          full + ("object_id" -> "http://unknown.example/X_1"))))
    }
    // a CURIE binding with an unknown prefix likewise raises
    intercept[IllegalArgumentException] {
      SparqlScan.queryMappings(spark,
        EndpointConfig(url = "http://e/sparql", prefixes = prefixes),
        executor = Some(_ => Seq(full + ("object_id" -> "nope:1"))))
    }
    // plain literals (labels) pass through — documented lenience
    assert(SparqlScan.safeCompress("a plain label", prefixes) == "a plain label")
  }
}
