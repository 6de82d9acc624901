package graft.graph

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ontology graph rewiring through equivalence mappings (reference
  * `rewire_graph`, src/sssom/rdf_util.py:21-88): build a rewrite map from
  * owl:equivalentClass/equivalentProperty mappings (subject→object or the
  * reverse; ambiguity resolved by a prefix precedence list, else error),
  * then rewrite every position of an external triple table.
  *
  * The reference walks an rdflib graph in memory; here the triple table is
  * a DataFrame of any size and the rewrite map is built with one
  * aggregation and applied with three broadcast joins (the map is
  * dictionary-scale) — or equivalently one `withColumns` over a broadcast
  * Scala map for the common case, which is what we do.
  */
object Rewire {
  import Schema._

  /** Build the src→tgt rewrite map (driver-side, dictionary-scale). */
  def rewireMap(mappings: DataFrame, subjectToObject: Boolean = true,
      precedence: Seq[String] = Seq.empty): Map[String, String] = {
    val eq = mappings.filter(col(PredicateId)
      .isin(OwlEquivalentClass, OwlEquivalentProperty))
    val (srcCol, tgtCol) =
      if (subjectToObject) (SubjectId, ObjectId) else (ObjectId, SubjectId)
    val pairs = eq.select(col(srcCol).as("src"), col(tgtCol).as("tgt"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))

    val grouped = pairs.groupBy(_._1)
    grouped.map { case (src, tgts) =>
      val candidates = tgts.map(_._2).distinct
      if (candidates.length == 1) src -> candidates.head
      else if (precedence.nonEmpty) {
        val ranked = candidates.sortBy { t =>
          val p = t.split(":", 2)(0)
          val i = precedence.indexOf(p)
          if (i < 0) Int.MaxValue else i
        }
        src -> ranked.head
      } else
        throw new IllegalArgumentException(
          s"Ambiguous rewiring: $src -> ${candidates.mkString(" vs ")}")
    }
  }

  /** Rewrite subject/predicate/object of a triple table through the map;
    * returns (rewired table, changed-row count).
    */
  def rewire(triples: DataFrame, mappings: DataFrame,
      subjectToObject: Boolean = true,
      precedence: Seq[String] = Seq.empty): (DataFrame, Long) = {
    val m = rewireMap(mappings, subjectToObject, precedence)
    rewireWithMap(triples, m)
  }

  /** Apply a pre-built (and possibly re-keyed, e.g. CURIE→IRI-expanded)
    * rewrite map to a triple table.
    */
  def rewireWithMap(triples: DataFrame, m: Map[String, String])
      : (DataFrame, Long) = {
    val bc = triples.sparkSession.sparkContext.broadcast(m)
    val rw = udf((v: String) => bc.value.getOrElse(v, v))
    val changed = udf((s: String, p: String, o: String) =>
      bc.value.contains(s) || bc.value.contains(p) || bc.value.contains(o))
    val out = triples
      .withColumn("__changed",
        changed(col("subject"), col("predicate"), col("object")))
      .withColumn("subject", rw(col("subject")))
      .withColumn("predicate", rw(col("predicate")))
      .withColumn("object", rw(col("object")))
    val n = out.filter(col("__changed")).count()
    (out.drop("__changed"), n)
  }
}
