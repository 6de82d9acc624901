package graft.tools

import graft.core._
import graft.graph.{Components, Rewire}
import graft.io._
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Command shell over the engine — the reference `sssom` click CLI
  * (src/sssom/cli.py:122-790), one subcommand per reference command.
  * Every command maps onto an already-tested engine op; this layer only
  * parses arguments, loads inputs, and writes outputs, so it adds no new
  * query semantics. Unknown flags, unpaired values, and typo'd dynamic
  * slots all fail fast (no silent-default runs — same contract as
  * `KgMain.parse`).
  *
  * Network-shell commands behave like the engine edges they wrap:
  * `sparql` against an `http(s)` URL and `serve-rdf` as an HTTP server
  * raise the documented offline error, while `sparql` against a local
  * SSSOM file runs the reference's exact generated query through
  * `SssomEndpoint.serve`, and `serve-rdf --query` evaluates one SPARQL
  * SELECT the same way (the FastAPI/uvicorn shell minus the socket,
  * reference writers.py:383-398).
  */
object Cli {

  // ---------- argument grammar ----------

  final case class Parsed(
      pos: Vector[String],
      vals: Map[String, Vector[String]],
      bools: Map[String, Boolean]) {
    def one(key: String): Option[String] = vals.get(key).map(_.last)
    def many(key: String): Vector[String] = vals.getOrElse(key, Vector.empty)
    def flag(key: String): Boolean = bools(key)
  }

  /** Per-command option grammar: short→long aliases, click-style
    * `--x/--no-x` boolean pairs with defaults, valued options (arity 1
    * unless in arity2), and `dynamic = true` for commands whose options
    * are generated from the schema (reference cli.py:633-647).
    */
  final case class Grammar(
      positional: String,
      aliases: Map[String, String] = Map.empty,
      boolDefaults: Map[String, Boolean] = Map.empty,
      valued: Set[String] = Set.empty,
      arity2: Set[String] = Set.empty,
      dynamic: Boolean = false,
      help: String = "")

  /** Two-token option values are joined with this separator internally. */
  private val Pair = "\u0000"

  def parseArgs(tokens: Seq[String], g: Grammar): Parsed = {
    val pos = Vector.newBuilder[String]
    var vals = Map.empty[String, Vector[String]]
    var bools = g.boolDefaults
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$msg (in: ${tokens.mkString(" ")})")
    while (i < tokens.length) {
      val t = tokens(i)
      val isOpt = t.startsWith("--") ||
        (t.length == 2 && t.startsWith("-") && !t.charAt(1).isDigit)
      if (isOpt) {
        val key0 =
          if (t.startsWith("--")) t.drop(2).replace('-', '_')
          else g.aliases.getOrElse(t.drop(1),
            fail(s"unknown short option $t")).replace('-', '_')
        // click-style off forms: --no-<x> and --non-embedded-mode
        val (key, boolVal) =
          if (key0 == "non_embedded_mode") ("embedded_mode", Some(false))
          else if (key0.startsWith("no_") &&
            g.boolDefaults.contains(key0.drop(3)))
            (key0.drop(3), Some(false))
          else if (g.boolDefaults.contains(key0)) (key0, Some(true))
          else (key0, None)
        boolVal match {
          case Some(b) => bools = bools.updated(key, b); i += 1
          case None =>
            if (!g.valued.contains(key) && !g.dynamic)
              fail(s"unknown option $t")
            val arity = if (g.arity2.contains(key)) 2 else 1
            if (i + arity > tokens.length - 1)
              fail(s"option $t expects $arity value(s)")
            val v = tokens.slice(i + 1, i + 1 + arity).mkString(Pair)
            vals = vals.updated(key, vals.getOrElse(key, Vector.empty) :+ v)
            i += 1 + arity
        }
      } else { pos += t; i += 1 }
    }
    Parsed(pos.result(), vals, bools)
  }

  private val out = Set("output")
  private val pc = Map("propagate" -> true, "condense" -> true)

  val grammars: Map[String, Grammar] = Map(
    "convert" -> Grammar("INPUT", Map("o" -> "output", "O" -> "output_format"),
      pc, out + "output_format",
      help = "Convert a file. -O tsv|rdf|owl|json|fhir_json|ontoportal_json"),
    "parse" -> Grammar("INPUT",
      Map("o" -> "output", "I" -> "input_format", "m" -> "metadata",
        "C" -> "prefix_map_mode", "F" -> "mapping_predicate_filter",
        "p" -> "clean_prefixes", "E" -> "embedded_mode"),
      pc ++ Map("clean_prefixes" -> true, "strict_clean_prefixes" -> true,
        "embedded_mode" -> true),
      out ++ Set("input_format", "metadata", "prefix_map_mode",
        "mapping_predicate_filter"),
      help = "Parse a file in a supported format into an SSSOM TSV file."),
    "validate" -> Grammar("INPUT", Map("V" -> "validation_types"),
      Map("propagate" -> true), Set("validation_types"),
      help = "Produce an error report for an SSSOM file."),
    "split" -> Grammar("INPUT", Map("d" -> "output_directory"),
      Map.empty, Set("output_directory", "method"),
      help = "Split input file into multiple output broken down by prefixes."),
    "ptable" -> Grammar("INPUT", Map("o" -> "output", "W" -> "inverse_factor"),
      Map.empty, out ++ Set("inverse_factor", "default_confidence"),
      help = "Convert an SSSOM file to a ptable for kboom/boomer."),
    "dedupe" -> Grammar("INPUT", Map("o" -> "output"), Map.empty, out,
      help = "Remove lower confidence duplicate lines from an SSSOM file."),
    "dosql" -> Grammar("INPUTS...", Map("o" -> "output", "Q" -> "query"),
      Map.empty, out + "query",
      help = "Run a SQL query over one or more SSSOM files (tables df1..dfN" +
        " and filename stems)."),
    "sparql" -> Grammar("", Map("o" -> "output", "e" -> "url", "g" -> "graph",
      "l" -> "limit", "c" -> "config", "P" -> "prefix"),
      Map("object_labels" -> false),
      out ++ Set("url", "graph", "limit", "config", "prefix"), Set("prefix"),
      help = "Run the reference's mapping SPARQL query. Offline build: " +
        "--url must be a local SSSOM TSV, served via SssomEndpoint."),
    "diff" -> Grammar("INPUT1 INPUT2", Map("o" -> "output"), Map.empty, out,
      help = "Compare two SSSOM files; union with UNIQUE_1/UNIQUE_2/" +
        "COMMON_TO_BOTH comments."),
    "partition" -> Grammar("INPUTS...", Map("d" -> "output_directory"),
      Map.empty, Set("output_directory"),
      help = "Partition an SSSOM into one file per connected component."),
    "cliquesummary" -> Grammar("INPUT",
      Map("o" -> "output", "m" -> "metadata", "s" -> "statsfile"),
      Map.empty, out ++ Set("metadata", "statsfile"),
      help = "Calculate summaries for each clique in a SSSOM file."),
    "crosstab" -> Grammar("INPUT",
      Map("o" -> "output", "f" -> "fields", "t" -> "transpose"),
      Map("transpose" -> false), out + "fields", Set("fields"),
      help = "Write sssom summary cross-tabulated by categories."),
    "correlations" -> Grammar("INPUT",
      Map("o" -> "output", "f" -> "fields", "t" -> "transpose"),
      Map("transpose" -> false), out + "fields", Set("fields"),
      help = "Calculate expected frequencies (chi²) of two category columns."),
    "merge" -> Grammar("INPUTS...", Map("o" -> "output", "R" -> "reconcile"),
      pc, out + "reconcile",
      help = "Merge multiple MappingSetDataFrames into one. -R true to " +
        "reconcile (dedupe + negation rules)."),
    "rewire" -> Grammar("INPUT",
      Map("o" -> "output", "m" -> "mapping_file", "I" -> "input_format",
        "O" -> "output_format"),
      Map.empty,
      out ++ Set("mapping_file", "input_format", "output_format",
        "precedence"),
      help = "Rewire an ontology using equivalent classes/properties from " +
        "a mapping file (turtle in/out)."),
    "reconcile-prefixes" -> Grammar("INPUT",
      Map("o" -> "output", "p" -> "reconcile_prefix_file"),
      Map.empty, out + "reconcile_prefix_file",
      help = "Reconcile prefix_map based on provided YAML file."),
    "sort" -> Grammar("INPUT",
      Map("o" -> "output", "k" -> "by_columns", "r" -> "by_rows"),
      Map.empty, out ++ Set("by_columns", "by_rows"),
      help = "Sort DataFrame columns canonically."),
    "filter" -> Grammar("INPUT", Map("o" -> "output"), Map.empty, out,
      dynamic = true,
      help = "Filter by LIKE patterns per column, e.g. --subject_id x:% " +
        "--object_id y:% (OR within a column, AND across columns)."),
    "annotate" -> Grammar("INPUT", Map("o" -> "output"), Map.empty,
      out + "replace_multivalued", dynamic = true,
      help = "Annotate metadata of a mapping set, e.g. --mapping_set_id " +
        "http://example.org/abcd."),
    "remove" -> Grammar("INPUT", Map("o" -> "output"), Map.empty,
      out + "remove_map",
      help = "Remove mappings from an input mapping (--remove-map FILE)."),
    "invert" -> Grammar("INPUT",
      Map("o" -> "output", "P" -> "subject_prefix"),
      Map("merge_inverted" -> true, "update_justification" -> true),
      out ++ Set("subject_prefix", "inverse_map"),
      help = "Invert subject and object IDs; -P restricts to a subject " +
        "prefix, --inverse-map supplies a predicate inversion YAML."),
    "serve-rdf" -> Grammar("INPUT", Map.empty,
      Map("hydrate" -> true), Set("host", "port", "query"),
      help = "Serve the SSSOM file as a SPARQL endpoint. Offline build: " +
        "pass --query to evaluate one SELECT and print bindings."))

  // ---------- i/o helpers ----------

  private def emitText(text: String, out: Option[String]): Unit = out match {
    case Some(p) =>
      val pp = Paths.get(p)
      if (pp.getParent != null) Files.createDirectories(pp.getParent)
      Files.write(pp, text.getBytes(UTF_8))
    case None => print(text)
  }

  private def msdfText(msdf: Msdf, condense: Boolean = true,
      sort: Boolean = true): String = {
    val t = Files.createTempFile("sssom-cli", ".tsv")
    try {
      SssomTsv.write(msdf, t.toString, condense = condense, sort = sort)
      new String(Files.readAllBytes(t), UTF_8)
    } finally Files.deleteIfExists(t)
  }

  private def writeMsdf(msdf: Msdf, out: Option[String],
      condense: Boolean = true): Unit = out match {
    case Some(p) => SssomTsv.write(msdf, p, condense = condense)
    case None => print(msdfText(msdf, condense))
  }

  /** Plain YAML subset load (same shape as the embedded header parser). */
  private def loadYaml(path: String): Vector[(String, MetaValue)] = {
    import scala.jdk.CollectionConverters._
    SssomTsv.parseMetaYaml(
      Files.readAllLines(Paths.get(path)).asScala.toVector)
  }

  private def yamlMap(meta: Vector[(String, MetaValue)], key: String)
      : Map[String, String] =
    meta.collectFirst { case (`key`, MetaMap(m)) => m.toMap }
      .getOrElse(Map.empty)

  /** Output format from -O or the output path extension (reference
    * `get_writer_function`, writers.py:657-674).
    */
  private def outputFormat(p: Parsed): String =
    p.one("output_format").getOrElse {
      p.one("output").map { o =>
        o.split('.').last match {
          case "ttl" | "rdf" => "rdf"
          case "owl" => "owl"
          case "json" => "json"
          case _ => "tsv"
        }
      }.getOrElse("tsv")
    }

  private def writeAs(msdf: Msdf, format: String, out: Option[String],
      condense: Boolean): Unit = format match {
    case "tsv" | "csv" => writeMsdf(msdf, out, condense)
    case "rdf" | "ttl" | "turtle" => emitText(SssomRdf.toTurtle(msdf), out)
    case "owl" => emitText(SssomOwl.toOwlTurtle(msdf), out)
    case "json" =>
      val t = Files.createTempFile("sssom-cli", ".json")
      try {
        SssomJson.writeJson(msdf, t.toString)
        emitText(new String(Files.readAllBytes(t), UTF_8), out)
      } finally Files.deleteIfExists(t)
    case "fhir_json" => emitText(SssomJson.toFhirJson(msdf), out)
    case "ontoportal_json" => emitText(SssomJson.toOntoportalJson(msdf), out)
    case other => throw new IllegalArgumentException(
      s"Unknown output format: $other")
  }

  /** Render a DataFrame as a headered TSV string (CLI-scale tables only:
    * crosstabs, clique summaries — the reference collects these too).
    */
  private def dfTsv(df: DataFrame): String = {
    val cols = df.columns
    val body = df.collect().map(r => cols.indices.map { i =>
      val v = r.get(i); if (v == null) "" else v.toString
    }.mkString("\t"))
    (cols.mkString("\t") +: body).mkString("", "\n", "\n")
  }

  // ---------- commands ----------

  def run(args: Array[String], spark: SparkSession): Int = {
    require(args.nonEmpty, s"usage: sssom <command> [options]; commands: " +
      grammars.keys.toSeq.sorted.mkString(", "))
    val cmd = args.head
    if (cmd == "help") {
      val sub = args.lift(1).getOrElse("")
      grammars.get(sub) match {
        case Some(g) => println(s"sssom $sub ${g.positional}\n  ${g.help}")
        case None => println("The command you seek help with does not exist.")
      }
      return 0
    }
    val g = grammars.getOrElse(cmd, throw new IllegalArgumentException(
      s"unknown command '$cmd'; commands: " +
        grammars.keys.toSeq.sorted.mkString(", ")))
    val p = parseArgs(args.toIndexedSeq.drop(1), g)
    val o = p.one("output")
    cmd match {
      case "convert" =>
        val msdf = SssomTsv.read(spark, input(p), propagate = p.flag("propagate"))
        writeAs(msdf, outputFormat(p), o, p.flag("condense"))

      case "parse" => parseCmd(spark, p)

      case "validate" =>
        val msdf = SssomTsv.read(spark, input(p),
          propagate = p.flag("propagate"))
        val report = Validators.validate(msdf)
        // reference SchemaValidationType values (constants.py:222-236);
        // Shacl/Sparql need optional external validators there too
        val known = Set("JsonSchema", "PrefixMapCompleteness",
          "StrictCurieFormat")
        val requested = p.many("validation_types").toSet
        val unknown = requested -- known
        if (unknown.nonEmpty) throw new IllegalArgumentException(
          s"unsupported validation type(s): ${unknown.toSeq.sorted.mkString(", ")}" +
            s" (supported: ${known.toSeq.sorted.mkString(", ")})")
        def want(t: String) = requested.isEmpty || requested.contains(t)
        var bad = false
        if (want("PrefixMapCompleteness")) {
          val ok = report.prefixViolations.isEmpty
          bad ||= !ok
          println(s"PrefixMapCompleteness: " +
            (if (ok) "OK" else s"missing prefixes: " +
              report.prefixViolations.mkString(", ")))
        }
        if (want("StrictCurieFormat")) {
          bad ||= report.curieFormatViolations > 0
          println(s"StrictCurieFormat: " +
            s"${report.curieFormatViolations} violation(s)")
        }
        if (want("JsonSchema")) {
          bad ||= report.schemaViolations > 0
          println(s"JsonSchema: " +
            s"${report.schemaViolations} violation(s)")
        }
        return if (bad) 1 else 0

      case "split" =>
        // --method (disjoint-indexes | dense-indexes) selects between the
        // reference's two index-construction strategies with identical
        // grouping semantics (parsers.py:1000-1135) — one hash
        // aggregation here, so the value is accepted and irrelevant
        val msdf = SssomTsv.read(spark, input(p))
        val dir = p.one("output_directory").getOrElse(".")
        Files.createDirectories(Paths.get(dir))
        SqlOps.splitDataframe(msdf.df).toSeq.sortBy(_._1).foreach {
          case (key, df) =>
            // each part carries only its own prefixes (the reference's
            // per-split subconverter, parsers.py:1076-1082)
            SssomTsv.write(msdf.withDf(df).cleanPrefixMap(strict = false),
              s"$dir/$key.sssom.tsv")
        }

      case "ptable" =>
        val msdf = SssomTsv.read(spark, input(p))
        val rows = Ptable.toPtable(msdf.df,
          inverseFactor = p.one("inverse_factor").map(_.toDouble)
            .getOrElse(0.5),
          defaultConfidence = p.one("default_confidence").map(_.toDouble))
        val text = rows.collect().map(r =>
          r.toSeq.map(v => if (v == null) "" else v.toString).mkString("\t"))
          .mkString("", "\n", "\n")
        emitText(text, o)

      case "dedupe" =>
        val msdf = SssomTsv.read(spark, input(p))
        writeMsdf(msdf.withDf(MergeReconcile.filterRedundantRows(msdf.df)), o)

      case "dosql" =>
        val q = p.one("query").getOrElse(
          throw new IllegalArgumentException("-Q/--query is required"))
        require(p.pos.nonEmpty, "dosql needs at least one input file")
        var last: Msdf = null
        val tables = scala.collection.immutable.ListMap(p.pos.map { fn =>
          last = SssomTsv.read(spark, fn)
          val stem = Paths.get(fn).getFileName.toString
            .takeWhile(_ != '.').toLowerCase
          stem -> last.df
        }: _*)
        val res = SqlOps.dosql(spark, q, tables)
        writeMsdf(Msdf(res, last.meta, last.prefixes), o)

      case "sparql" => sparqlCmd(spark, p)

      case "diff" =>
        require(p.pos.length == 2, "diff takes exactly two inputs")
        val m1 = SssomTsv.read(spark, p.pos(0))
        val m2 = SssomTsv.read(spark, p.pos(1))
        val d = MergeReconcile.diff(m1.df, m2.df)
        val meta = m1.meta.filterNot(_._1 == "comment") :+
          ("comment" -> MetaString(s"Diff between ${p.pos(0)} and " +
            s"${p.pos(1)}. See comment column for information."))
        writeMsdf(Msdf(d.combined, meta, m1.prefixes.chain(m2.prefixes)), o)

      case "partition" =>
        require(p.pos.nonEmpty, "partition needs at least one input")
        // the reference only partitions the LAST input (cli.py:429 pops)
        val msdf = SssomTsv.read(spark, p.pos.last)
        val dir = p.one("output_directory").getOrElse(".")
        Files.createDirectories(Paths.get(dir))
        val withComp = Components.assignComponents(msdf.df)
          .localCheckpoint(true)
        val comps = withComp.select("component").distinct()
          .collect().map(_.getString(0)).sorted
        comps.zipWithIndex.foreach { case (c, i) =>
          val part = withComp.filter(col("component") === c)
            .drop("component")
          SssomTsv.write(msdf.withDf(part), s"$dir/clique_${i + 1}.sssom.tsv")
        }

      case "cliquesummary" =>
        val msdf = SssomTsv.read(spark, input(p),
          metaPath = p.one("metadata"))
        val summary = Components.summarizeCliques(msdf.df).localCheckpoint(true)
        emitText(dfTsv(summary), o)
        p.one("statsfile").foreach { sf =>
          // reference df.describe().transpose() — stats as rows
          val stats = summary.select(summary.columns
            .filter(c => c != "members").map(col).toIndexedSeq: _*)
            .summary("count", "mean", "stddev", "min", "max")
          val rows = stats.collect()
          val statNames = rows.map(_.getString(0))
          val cols = stats.columns.drop(1)
          val text = (("" +: statNames.toSeq).mkString("\t") +:
            cols.toSeq.zipWithIndex.map { case (c, ci) =>
              (c +: rows.toSeq.map { r =>
                val v = r.get(ci + 1); if (v == null) "" else v.toString
              }).mkString("\t")
            }).mkString("", "\n", "\n")
          emitText(text, Some(sf))
        }

      case "crosstab" =>
        emitText(dfTsv(crosstabWide(spark, p)), o)

      case "correlations" =>
        val (f1, f2) = fields(p)
        val ct = contingency(spark, p)
        // expected = row_total · col_total / total (reference cli.py:523-527)
        val rowT = ct.groupBy(col(f1)).agg(sum("n").as("rt"))
        val colT = ct.groupBy(col(f2)).agg(sum("n").as("ctot"))
        val grand = ct.agg(sum("n").as("t"))
        val exp = ct.join(rowT, f1).join(colT, f2).crossJoin(grand)
          .select(col(f1), col(f2),
            (col("rt") * col("ctot") / col("t")).as("expected"))
          .localCheckpoint(true)
        val wide = exp.groupBy(col(f1)).pivot(f2).agg(first("expected"))
          .na.fill(0.0).orderBy(col(f1))
        emitText(dfTsv(wide), o)
        // reference also prints (value, row, col) sorted ascending
        exp.collect().map(r => (r.getDouble(2), r.getString(0), r.getString(1)))
          .sortBy(_._1)
          .foreach { case (v, a, b) => println(s"$v\t$a\t$b") }

      case "merge" =>
        require(p.pos.nonEmpty, "merge needs at least one input")
        val msdfs = p.pos.map(f =>
          SssomTsv.read(spark, f, propagate = p.flag("propagate")))
        val reconcile = p.one("reconcile").exists(_.toBoolean)
        writeMsdf(MergeReconcile.merge(msdfs, reconcile), o,
          condense = p.flag("condense"))

      case "rewire" => rewireCmd(spark, p)

      case "reconcile-prefixes" =>
        val msdf = SssomTsv.read(spark, input(p))
        val yamlPath = p.one("reconcile_prefix_file").getOrElse(
          throw new IllegalArgumentException(
            "-p/--reconcile-prefix-file is required"))
        val y = loadYaml(yamlPath)
        writeMsdf(Normalize.reconcilePrefixes(msdf,
          yamlMap(y, "prefix_synonyms"),
          yamlMap(y, "prefix_expansion_reconciliation")), o)

      case "sort" =>
        val msdf = SssomTsv.read(spark, input(p))
        // columns always sort canonically (the writer's invariant and the
        // reference's working default — by_columns=False trips a NameError
        // in the reference when by_rows is set, util.py:1611-1617);
        // -r false skips the row sort
        val byRows = p.one("by_rows").forall(_.toBoolean)
        emitText(msdfText(msdf, sort = byRows), o)

      case "filter" =>
        val msdf = SssomTsv.read(spark, input(p))
        val params = dynamicParams(p)
        val invalid = params.keys.filterNot(msdf.df.columns.contains).toSeq
        if (invalid.nonEmpty) throw new IllegalArgumentException(
          s"The params are invalid: ${invalid.sorted.mkString(", ")}")
        writeMsdf(msdf.withDf(Normalize.likeFilter(msdf.df, params)), o)

      case "annotate" =>
        val msdf = SssomTsv.read(spark, input(p))
        val params = dynamicParams(p) - "replace_multivalued"
        val invalid =
          params.keys.filterNot(Schema.mappingSetSlots.contains).toSeq
        if (invalid.nonEmpty) throw new IllegalArgumentException(
          s"Not all parameters are mapping set slots: " +
            invalid.sorted.mkString(", "))
        val replace = p.one("replace_multivalued").exists(_.toBoolean)
        writeMsdf(SqlOps.annotate(msdf, params, replace), o)

      case "remove" =>
        val msdf = SssomTsv.read(spark, input(p))
        val rm = SssomTsv.read(spark, p.one("remove_map").getOrElse(
          throw new IllegalArgumentException("--remove-map is required")))
        writeMsdf(msdf.withDf(
          MergeReconcile.removeMappings(msdf.df, rm.df)), o)

      case "invert" =>
        val msdf = SssomTsv.read(spark, input(p))
        val predMap = p.one("inverse_map")
          .map(f => yamlMap(loadYaml(f), "inverse_predicate_map"))
          .filter(_.nonEmpty)
          .getOrElse(Schema.predicateInvertMap)
        writeMsdf(msdf.withDf(Invert.invertMappings(msdf.df,
          subjectPrefix = p.one("subject_prefix"),
          mergeInverted = p.flag("merge_inverted"),
          updateJustification = p.flag("update_justification"),
          predicateInvertMap = predMap)), o)

      case "serve-rdf" =>
        val msdf = SssomTsv.read(spark, input(p))
        p.one("query") match {
          case Some(q) =>
            val bindings =
              SssomEndpoint.serve(msdf, hydrate = p.flag("hydrate"))(q)
            val vars = bindings.flatMap(_.keys).distinct
            println(vars.mkString("\t"))
            bindings.foreach(b =>
              println(vars.map(v => b.getOrElse(v, "")).mkString("\t")))
          case None => throw new UnsupportedOperationException(
            "serve-rdf as an HTTP server requires network access " +
              "(reference runs uvicorn, cli.py:785-789); this build is " +
              "offline — pass --query '<SPARQL SELECT>' to evaluate one " +
              "query against the set's graph (SssomEndpoint)")
        }
    }
    0
  }

  private def input(p: Parsed): String = {
    require(p.pos.length == 1,
      s"expected exactly one INPUT, got: ${p.pos.mkString(" ")}")
    p.pos.head
  }

  private def dynamicParams(p: Parsed): Map[String, Seq[String]] =
    (p.vals - "output").map { case (k, vs) => k -> (vs: Seq[String]) }

  private def fields(p: Parsed): (String, String) = {
    val fs = p.one("fields")
      .map(_.split(Pair)).getOrElse(
        Array("subject_category", "object_category"))
    require(fs.length == 2, "-f/--fields takes two column names")
    if (p.flag("transpose")) (fs(1), fs(0)) else (fs(0), fs(1))
  }

  private def contingency(spark: SparkSession, p: Parsed): DataFrame = {
    val (f1, f2) = fields(p)
    val msdf = SssomTsv.read(spark, input(p))
    val dfm = Normalize.removeUnmatched(msdf.df)
    SqlOps.crosstab(dfm, f1, f2).localCheckpoint(true)
  }

  private def crosstabWide(spark: SparkSession, p: Parsed): DataFrame = {
    val (f1, f2) = fields(p)
    contingency(spark, p)
      .groupBy(col(f1)).pivot(f2).agg(first("n"))
      .na.fill(0).orderBy(col(f1))
  }

  private def parseCmd(spark: SparkSession, p: Parsed): Unit = {
    val in = input(p)
    val fmt = p.one("input_format").getOrElse {
      val ext = in.replaceAll("\\.gz$", "").split('.').last
      if (ext == "csv") "csv" else if (ext == "rdf" || ext == "ttl") "rdf"
      else if (ext == "json") "json" else "tsv"
    }
    // metadata YAML + prefix-map-mode (reference io.py:171-203):
    // metadata_only keeps the file's curie_map, sssom_default_only drops
    // it (built-ins only), merged chains both (built-ins always chain
    // underneath, as in read()).
    val metaY = p.one("metadata").map(loadYaml).getOrElse(Vector.empty)
    val mode = p.one("prefix_map_mode").getOrElse("metadata_only")
    val extraMeta = mode match {
      case "sssom_default_only" => metaY.filterNot(_._1 == "curie_map")
      case "metadata_only" | "merged" => metaY
      case other => throw new IllegalArgumentException(
        s"Invalid prefix map mode: $other")
    }
    val extraPrefixes = PrefixMap(
      extraMeta.collectFirst { case ("curie_map", MetaMap(m)) => m }
        .getOrElse(Vector.empty))
    val msdf0 = fmt match {
      case "tsv" | "csv" =>
        SssomTsv.read(spark, in, extraMeta = extraMeta,
          propagate = p.flag("propagate"))
      case "rdf" =>
        val m = SssomRdf.read(spark, in)
        m.copy(meta = m.meta ++
          extraMeta.filterNot(kv => kv._1 == "curie_map" ||
            m.meta.exists(_._1 == kv._1)))
      case "json" => SssomJson.readJson(spark, in)
      case "obographs-json" =>
        SssomJson.readObographs(spark, in,
          PrefixMap.builtIn.chain(extraPrefixes))
      case "alignment-api-xml" =>
        SssomJson.readAlignmentXml(spark, in,
          PrefixMap.builtIn.chain(extraPrefixes))
      case other => throw new IllegalArgumentException(
        s"Unknown input format: $other")
    }
    val preds = p.many("mapping_predicate_filter")
    val filtered =
      if (preds.isEmpty) msdf0
      else msdf0.withDf(Normalize.filterByPredicates(msdf0.df, preds,
        msdf0.prefixes))
    val cleaned =
      if (p.flag("clean_prefixes"))
        filtered.cleanPrefixMap(strict = p.flag("strict_clean_prefixes"))
      else filtered
    val o = p.one("output")
    if (p.flag("embedded_mode")) writeMsdf(cleaned, o, p.flag("condense"))
    else {
      // non-embedded: plain table to OUT, metadata (including slots the
      // condense step lifted out of the table) to OUT with .yml
      // (reference write_table embedded_mode=False, writers.py:96-118)
      val prepared =
        if (p.flag("condense")) cleaned.condense() else cleaned
      val bare = prepared.copy(meta = Vector.empty,
        prefixes = PrefixMap(Vector.empty))
      val yml = SssomTsv.metaToYaml(prepared.meta, prepared.prefixes)
        .linesIterator.map(_.dropWhile(_ == '#')).mkString("", "\n", "\n")
      o match {
        case Some(path) =>
          writeMsdf(bare, Some(path), condense = false)
          emitText(yml, Some(path.replaceAll("\\.[^./]*$", "") + ".yml"))
        case None =>
          writeMsdf(bare, None, condense = false)
          print(yml)
      }
    }
  }

  private def sparqlCmd(spark: SparkSession, p: Parsed): Unit = {
    val y = p.one("config").map(loadYaml).getOrElse(Vector.empty)
    def yOne(k: String): Option[String] =
      y.collectFirst { case (`k`, MetaString(v)) => v }
    val url = p.one("url").orElse(yOne("url")).getOrElse(
      throw new IllegalArgumentException("-e/--url is required"))
    val prefixPairs = p.many("prefix").map { v =>
      val Array(a, b) = v.split(Pair, 2); (a, b)
    }
    val cfg = SparqlScan.EndpointConfig(
      url = url,
      graph = p.one("graph").orElse(yOne("graph")),
      prefixes = PrefixMap(prefixPairs).chain(PrefixMap.builtIn),
      predicates =
        y.collectFirst { case ("predicates", MetaList(ps)) => ps: Seq[String] },
      limit = p.one("limit").orElse(yOne("limit")).map(_.toLong),
      includeObjectLabels = p.flag("object_labels") ||
        yOne("include_object_labels").exists(_.toBoolean))
    if (url.startsWith("http://") || url.startsWith("https://"))
      throw new UnsupportedOperationException(
        "SPARQL against a remote endpoint requires network access " +
          "(reference queries via SPARQLWrapper, sparql_util.py:80-84); " +
          "this build is offline — pass a local turtle graph or SSSOM " +
          "TSV as --url to serve it through SssomEndpoint instead")
    // local file: serve its graph and run the reference's generated
    // query against it (SparqlScan round-trip, both sides ours). A .ttl
    // is served as-is; an SSSOM TSV is served as its hydrated RDF graph
    // (the reference endpoint default, writers.py:384).
    val executor =
      if (url.endsWith(".ttl") || url.endsWith(".n3")) {
        val text = new String(Files.readAllBytes(Paths.get(url)), UTF_8)
        SssomEndpoint.serveTriples(SssomEndpoint.triplesFromTurtle(text),
          "file://" + Paths.get(url).toAbsolutePath)
      } else SssomEndpoint.serve(SssomTsv.read(spark, url), hydrate = true)
    val msdf = SparqlScan.queryMappings(spark, cfg, Some(executor))
    writeMsdf(msdf, p.one("output"))
  }

  private def rewireCmd(spark: SparkSession, p: Parsed): Unit = {
    Seq("input_format", "output_format").foreach { k =>
      val f = p.one(k).getOrElse("turtle")
      require(f == "turtle" || f == "ttl",
        s"only turtle ontologies are supported offline, got --$k $f")
    }
    val mapping = SssomTsv.read(spark, p.one("mapping_file").getOrElse(
      throw new IllegalArgumentException("-m/--mapping-file is required")))
    val text = new String(Files.readAllBytes(Paths.get(input(p))), UTF_8)
    val triples = flattenTurtle(text)
    // the rewrite map is CURIE→CURIE from the standardized mapping set;
    // ontology nodes are IRIs — expand both sides (reference rewire_graph
    // expands through the msdf converter, rdf_util.py:35-44)
    val m = Rewire.rewireMap(mapping.df,
      precedence = p.many("precedence"))
      .map { case (k, v) =>
        mapping.prefixes.expandOrSelf(k) -> mapping.prefixes.expandOrSelf(v)
      }
    import spark.implicits._
    val df = triples.toDF("subject", "predicate", "object")
    val (out, _) = Rewire.rewireWithMap(df, m)
    val body = out.collect().map { r =>
      val s = r.getString(0); val pr = r.getString(1); val ob = r.getString(2)
      s"${nodeTtl(s)} ${nodeTtl(pr)} ${nodeTtl(ob)} ."
    }.sorted.mkString("", "\n", "\n")
    emitText(body, p.one("output"))
  }

  private def nodeTtl(v: String): String =
    if (v.startsWith("\"") || v.startsWith("_:")) v else s"<$v>"

  /** Flatten a turtle document to (s, p, o) strings: IRIs expanded
    * through the document's @prefix declarations, literals kept in
    * `"lexical"^^<dt>` form, blank nodes numbered `_:bN`.
    */
  private[tools] def flattenTurtle(text: String)
      : Vector[(String, String, String)] = {
    val (decls, statements) = new SssomRdf.TurtleParser(text).document()
    val pm = PrefixMap(decls)
    val out = Vector.newBuilder[(String, String, String)]
    var bn = 0
    def termStr(t: SssomRdf.Term): String = t match {
      case SssomRdf.Res(v, true) => v
      case SssomRdf.Res(v, false) => pm.expand(v).getOrElse(v)
      case SssomRdf.Lit(v, dt) =>
        "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" +
          dt.map(d => "^^" + nodeTtl(pm.expand(d).getOrElse(d))).getOrElse("")
      case b: SssomRdf.BNodeT =>
        bn += 1
        val id = s"_:b$bn"
        b.props.foreach { case (pr, ob) =>
          out += ((id, termStr(pr), termStr(ob)))
        }
        id
    }
    statements.foreach { case (subj, props) =>
      val s = termStr(subj)
      props.foreach { case (pr, ob) => out += ((s, termStr(pr), termStr(ob))) }
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("sssom-cli")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try sys.exit(run(args, spark))
    finally spark.stop()
  }
}
