package graft.io

import graft.SparkSpec

/** SPARQL endpoint serve semantics against the reference's own documented
  * example query (writers.py:361-380): the served graph is the one our
  * Turtle writer emits, so the example query must return every reified
  * axiom with its justification, honoring LIMIT.
  */
class SssomEndpointSpec extends SparkSpec {

  // the reference's EXAMPLE_SPARQL_QUERY, verbatim shape (writers.py:361)
  private val exampleQuery = """
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    PREFIX owl: <http://www.w3.org/2002/07/owl#>
    PREFIX sssom: <https://w3id.org/sssom/>
    PREFIX obo: <http://purl.obolibrary.org/obo/>
    PREFIX semapv: <https://w3id.org/semapv/vocab/>
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    PREFIX pav: <http://purl.org/pav/>
    PREFIX orcid: <https://orcid.org/>
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

    SELECT ?s ?p ?o ?justification {
      [] a owl:Axiom ;
        owl:annotatedSource ?s ;
        owl:annotatedProperty ?p ;
        owl:annotatedTarget ?o ;
        sssom:mapping_justification ?justification ;
    }
    LIMIT 50
"""

  test("the reference example query returns reified axioms, LIMIT honored") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val rows = SssomEndpoint.select(msdf, exampleQuery)
    assert(rows.length == 50) // LIMIT 50 over 141 axioms
    rows.foreach { b =>
      assert(Set("s", "p", "o", "justification").subsetOf(b.keySet))
      assert(b("justification").startsWith("https://w3id.org/semapv/vocab/"))
    }
  }

  test("without LIMIT, every axiom is a solution and bindings stay joined " +
      "per axiom (s,p,o come from one reified node)") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    val q = exampleQuery.replace("LIMIT 50", "")
    val rows = SssomEndpoint.select(msdf, q)
    assert(rows.length == 141)
    // cross-check against the mapping rows themselves: the (s,p,o)
    // triples served must be exactly the expanded mapping triples
    val pm = msdf.prefixes
    val expected = msdf.df.select("subject_id", "predicate_id", "object_id")
      .collect()
      .map(r => (pm.expandOrSelf(r.getString(0)), pm.expandOrSelf(r.getString(1)),
        pm.expandOrSelf(r.getString(2)))).toSet
    val served = rows.map(b => (b("s"), b("p"), b("o"))).toSet
    assert(served == expected)
  }

  test("select supports explicit resources, SELECT *, and the executor " +
      "shape SparqlScan injects") {
    val msdf = SssomTsv.read(spark, fixture("basic.tsv"))
    // pin one subject: every mapping for a known entity
    val one = SssomEndpoint.select(msdf,
      """PREFIX owl: <http://www.w3.org/2002/07/owl#>
        |SELECT ?o { [] a owl:Axiom ;
        |  owl:annotatedSource <http://example.org/x/bone_element> ;
        |  owl:annotatedTarget ?o . }""".stripMargin)
    assert(one.length == 9 && one.forall(_.contains("o"))) // 9 rows in basic.tsv
    // SELECT * binds all named variables
    val star = SssomEndpoint.select(msdf,
      """PREFIX owl: <http://www.w3.org/2002/07/owl#>
        |SELECT * { ?ax a owl:Axiom ; owl:annotatedSource ?s . } LIMIT 3""".stripMargin)
    assert(star.length == 3 && star.forall(b => b.contains("ax") && b.contains("s")))
    // serve() is a reusable query => bindings executor (the exact edge
    // SparqlScan.queryMappings takes as its injected network boundary)
    val app = SssomEndpoint.serve(msdf)
    assert(app(exampleQuery).length == 50)
  }
}
