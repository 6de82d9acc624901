package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.core.{Msdf, PrefixMap, Schema}
import graft.ops.Invert

/** OWL writer (reference `to_owl_graph`, src/sssom/writers.py:272-353):
  * the reified-axiom RDF shape plus the reference's five SPARQL
  * INSERT/DELETE rewrites, applied as deterministic transforms over the
  * axiom set the Turtle writer already renders:
  *
  *  1. mappings are first INVERTED (reference calls `invert_mappings`
  *     with merge_inverted=False, update_justification=False — invertible
  *     unmodified rows flip, predicate-modified and non-invertible rows
  *     pass through, writers.py:274-278);
  *  2. every axiom is hydrated into its direct triple (annotatedSource,
  *     annotatedProperty, annotatedTarget) — negated and NoTermFound rows
  *     included (`_hydrate_axioms(add_negative=True,
  *     add_no_term_found=True)`, writers.py:285);
  *  3. both ends of an owl:equivalentClass triple are typed owl:Class,
  *     both ends of owl:equivalentProperty typed owl:ObjectProperty;
  *  4. the set node becomes `[] a owl:Ontology` (not sssom:MappingSet)
  *     and its sssom:mappings links are dropped;
  *  5. every annotation property used on an axiom (other than rdf:type /
  *     owl:annotated*) is declared an owl:AnnotationProperty.
  *
  * Export edge: rows are collected on the driver, like the reference's
  * in-memory rdflib Graph (data-scale output is the Parquet sink).
  */
object SssomOwl {

  private val OwlNs = "http://www.w3.org/2002/07/owl#"
  private val annotatedQNames =
    Set("owl:annotatedSource", "owl:annotatedProperty", "owl:annotatedTarget")

  def toOwlTurtle(msdfIn: Msdf): String = {
    // inverse of the parse-time propagate(), same as the Turtle writer:
    // uniform propagatable slots render on the ontology node, not on
    // every axiom (the reference df keeps them in set metadata)
    val msdf = msdfIn.condense()
    val inverted = Invert.invertMappings(msdf.df,
      mergeInverted = false, updateJustification = false)
    val cols = inverted.columns
    val rows = inverted.collect()
    val pm = PrefixMap.builtIn.chain(msdf.prefixes)
    def expandTok(v: String): String = pm.expand(v).getOrElse(v)

    val sb = new StringBuilder
    sb.append(SssomRdf.prefixBlock(msdf))
    sb.append("\n")

    val slotLines = rows.map(r => SssomRdf.axiomSlotLines(cols, r, "    "))

    // rewrite 5: annotation-property declarations for every slot that
    // actually occurs on an axiom (an all-empty column emits no triples,
    // hence no declaration — matches the SPARQL's "?o a owl:Axiom; ?p ?v")
    slotLines.flatMap(_.map(_._1)).distinct
      .map(SssomRdf.slotQName)
      .filterNot(annotatedQNames)
      .sorted
      .foreach(q => sb.append(s"$q a owl:AnnotationProperty .\n\n"))

    // rewrite 2 (hydration) + rewrite 3 (class/property typing)
    def tok(r: org.apache.spark.sql.Row, slot: String): String =
      SssomRdf.renderSlotValue(slot, r.getString(r.fieldIndex(slot)))
    val direct = rows.map { r =>
      (tok(r, Schema.SubjectId), tok(r, Schema.PredicateId),
        tok(r, Schema.ObjectId),
        expandTok(r.getString(r.fieldIndex(Schema.PredicateId))))
    }.distinct
    val classes = scala.collection.mutable.LinkedHashSet.empty[String]
    val objProps = scala.collection.mutable.LinkedHashSet.empty[String]
    direct.foreach { case (s, _, o, pIri) =>
      if (pIri == OwlNs + "equivalentClass") { classes += s; classes += o }
      if (pIri == OwlNs + "equivalentProperty") { objProps += s; objProps += o }
    }
    classes.toVector.sorted.foreach(e => sb.append(s"$e a owl:Class .\n"))
    objProps.toVector.sorted
      .foreach(e => sb.append(s"$e a owl:ObjectProperty .\n"))
    direct.foreach { case (s, p, o, _) => sb.append(s"$s $p $o .\n") }

    // rewrite 4: ontology node with the set metadata, no mappings links
    sb.append("\n[] a owl:Ontology")
    val meta = SssomRdf.metaLines(msdf, "    ")
    if (meta.nonEmpty) sb.append(" ;\n").append(meta.mkString(" ;\n"))
    sb.append(" .\n")

    // the reified axioms themselves (now over the inverted rows)
    slotLines.foreach { lines =>
      sb.append("\n[] a owl:Axiom ;\n")
      sb.append(lines.map(_._2).mkString(" ;\n")).append(" .\n")
    }
    sb.result()
  }

  def write(msdf: Msdf, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, toOwlTurtle(msdf).getBytes(StandardCharsets.UTF_8))
  }
}
