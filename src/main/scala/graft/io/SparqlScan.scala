package graft.io

import graft.core.{Msdf, PrefixMap}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** SPARQL endpoint scan (reference `query_mappings`,
  * src/sssom/sparql_util.py:35-91): builds the reference's mapping-scan
  * SELECT for an endpoint configuration and turns the JSON bindings into
  * an Msdf, CURIE-compressing every IRI. The network edge — actually
  * POSTing the query — is an injected `query => bindings` executor, same
  * pattern as the http(s) TSV fetcher: the query construction and result
  * shaping (the real logic) are fully testable in this zero-egress build,
  * and a caller with network access supplies a SPARQLWrapper-equivalent
  * executor.
  */
object SparqlScan {

  /** Endpoint configuration (reference EndpointConfig,
    * sparql_util.py:22-32). `graph = None` scans all graphs (`?g`);
    * `predicates = None` defaults to skos exact/close match.
    */
  final case class EndpointConfig(
      url: String,
      graph: Option[String] = None,
      prefixes: PrefixMap = PrefixMap.builtIn,
      predicates: Option[Seq[String]] = None,
      limit: Option[Long] = None,
      includeObjectLabels: Boolean = false)

  private val SkosNs = "http://www.w3.org/2004/02/skos/core#"

  private[io] def columns(config: EndpointConfig): Seq[String] = {
    val base = Seq("subject_id", "subject_label", "predicate_id",
      "object_id", "mapping_provider")
    if (config.includeObjectLabels)
      base.patch(base.length - 1, Seq("object_label"), 0)
    else base
  }

  /** The reference's mapping-scan SELECT, token for token
    * (sparql_util.py:43-77).
    */
  def buildQuery(config: EndpointConfig): String = {
    val g = config.graph.map(u => s"<$u>").getOrElse("?g")
    val predicateIris = config.predicates match {
      case None => Seq(SkosNs + "exactMatch", SkosNs + "closeMatch")
      case Some(ps) => ps.map(p => config.prefixes.expand(p).getOrElse(
        if (p.startsWith("http://") || p.startsWith("https://")) p
        else throw new IllegalArgumentException(
          s"cannot expand predicate CURIE '$p' with the configured prefixes")))
    }
    val predstr = predicateIris.map(p => s"<$p>").mkString(" ")
    val limitstr = config.limit.map(l => s"LIMIT $l").getOrElse("")
    val colstr = columns(config).map("?" + _).mkString(" ")
    val olq = if (config.includeObjectLabels)
      "OPTIONAL { ?object_id rdfs:label ?object_label }" else ""
    s"""PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
       |SELECT $colstr
       |WHERE {
       |    GRAPH $g {
       |      VALUES ?predicate_id { $predstr } .
       |      ?subject_id ?predicate_id ?object_id .
       |      ?subject_id rdfs:label ?subject_label
       |    } .
       |    $olq
       |    BIND($g as ?mapping_provider)
       |} $limitstr
       |""".stripMargin
  }

  /** Strict value compression (reference `safe_compress` =
    * `converter.compress_or_standardize(value, strict=True)`,
    * util.py:1820-1828): an IRI must compress — an endpoint emitting IRIs
    * outside the configured prefix map is a configuration error, and
    * silently passing raw IRIs through would produce a structurally valid
    * but semantically different Msdf. A CURIE standardizes through the
    * expand→compress round-trip and likewise must resolve. Plain literals
    * (labels) pass through unchanged — a documented lenience vs the
    * reference, whose strict converter call receives label literals too.
    */
  private[io] def safeCompress(v: String, prefixes: PrefixMap): String =
    if (PrefixMap.looksLikeIri(v))
      prefixes.compress(v).getOrElse(throw new IllegalArgumentException(
        s"SPARQL binding IRI not compressible with the configured prefix map: $v"))
    else if (PrefixMap.looksLikeCurie(v))
      prefixes.expand(v).flatMap(prefixes.compress).getOrElse(
        throw new IllegalArgumentException(
          s"SPARQL binding CURIE has no configured prefix: $v"))
    else v

  /** Run the scan: build the query, execute it through `executor`
    * (variable → IRI/literal value per binding row), compress every value
    * through the configured converter (reference `safe_compress`), and
    * assemble the Msdf. A variable absent from a binding row (e.g. an
    * unmatched OPTIONAL object_label) becomes null, matching the
    * reference's pandas NaN from ragged binding dicts.
    */
  def queryMappings(spark: SparkSession, config: EndpointConfig,
      executor: Option[String => Seq[Map[String, String]]] = None): Msdf = {
    val exec = executor.getOrElse(throw new UnsupportedOperationException(
      "SPARQL scan requires network access (reference queries via " +
        "SPARQLWrapper, sparql_util.py:80-84); this build is offline — " +
        "inject an executor (query => bindings)"))
    val bindings = exec(buildQuery(config))
    val cols = columns(config)
    val rows = bindings.map { b =>
      Row.fromSeq(cols.map(c =>
        b.get(c).map(v => safeCompress(v, config.prefixes)).orNull))
    }
    val schema = StructType(cols.map(c => StructField(c, StringType,
      nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 10000)),
      schema)
    Msdf(df, Vector.empty, config.prefixes)
  }
}
