package graft.ops

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CURIE standardization, prefix filters and small row filters.
  *
  * References: `_standardize_df_references` (src/sssom/util.py:223-231),
  * `filter_prefixes` / `filter_out_prefixes` (util.py:1484-1539),
  * `remove_unmatched` (util.py:836-845), `reconcile_prefix_and_data`
  * (util.py:1575-1597), `filter_file` LIKE filter (src/sssom/io.py:328-374).
  */
object Normalize {
  import Schema._

  private def hasCol(df: DataFrame, c: String) = df.columns.contains(c)

  /** Standardize every EntityReference column through the prefix map
    * (broadcast to executors inside a deterministic UDF; multivalued
    * pipe-joined cells are standardized element-wise).
    */
  def standardizeReferences(df: DataFrame, prefixes: PrefixMap): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val bc = sc.broadcast(prefixes)
    val std = udf { (v: String) =>
      if (v == null || v.isEmpty) v
      else v.split("\\|", -1).map(x => bc.value.standardize(x.trim))
        .mkString("|")
    }
    entityReferenceSlots.filter(hasCol(df, _)).foldLeft(df) { (d, c) =>
      d.withColumn(c, std(col(c)))
    }
  }

  /** prefix of a CURIE column value (reference `get_prefix_from_curie`). */
  def prefixOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.contains(":"), split(c, ":", 2).getItem(0)).otherwise(lit(""))

  private def rowPrefixes(df: DataFrame, features: Seq[String]) =
    array_distinct(array(
      features.filter(hasCol(df, _)).map(f => prefixOf(col(f))): _*))

  /** Keep rows whose feature-column prefixes are all (or any) in the set
    * (reference `filter_prefixes`).
    */
  def filterPrefixes(df: DataFrame, prefixes: Set[String],
      features: Seq[String] = KeyFeatures,
      requireAll: Boolean = true): DataFrame = {
    val ps = rowPrefixes(df, features)
    val inSet = (p: org.apache.spark.sql.Column) =>
      p.isin(prefixes.toSeq: _*)
    val cond =
      if (requireAll) forall(ps, inSet)
      else exists(ps, inSet)
    df.filter(cond)
  }

  /** Drop rows containing any (or all) of the given prefixes
    * (reference `filter_out_prefixes`).
    */
  def filterOutPrefixes(df: DataFrame, prefixes: Set[String],
      features: Seq[String] = KeyFeatures,
      requireAll: Boolean = false): DataFrame = {
    val ps = rowPrefixes(df, features)
    val contains = (p: String) => array_contains(ps, p)
    val cond =
      if (requireAll) prefixes.map(contains).reduce(_ && _)
      else prefixes.map(contains).reduce(_ || _)
    df.filter(!cond)
  }

  /** Drop `predicate_id == "noMatch"` rows (reference `remove_unmatched`). */
  def removeUnmatched(df: DataFrame): DataFrame =
    df.filter(col(PredicateId) =!= "noMatch")

  /** Standardize both the table's EntityReference columns and the
    * set-level metadata through the prefix map (reference
    * `MappingSetDataFrame.standardize_references`, src/sssom/util.py:218-221).
    */
  def standardizeAll(msdf: Msdf): Msdf =
    msdf.standardizeMetadata()
      .withDf(standardizeReferences(msdf.df, msdf.prefixes))

  /** Rename prefixes in the map and rewire the data accordingly
    * (reference `reconcile_prefix_and_data`).
    */
  def reconcilePrefixes(msdf: Msdf, renames: Map[String, String],
      expansions: Map[String, String] = Map.empty): Msdf = {
    val newPrefixes =
      msdf.prefixes.renamePrefixes(renames).rewireExpansions(expansions)
    val sc = msdf.df.sparkSession.sparkContext
    val bc = sc.broadcast(renames)
    val remap = udf { (v: String) =>
      if (v == null || v.isEmpty) v
      else v.split("\\|", -1).map { x =>
        val i = x.indexOf(':')
        if (i <= 0) x
        else bc.value.get(x.substring(0, i))
          .map(np => np + x.substring(i)).getOrElse(x)
      }.mkString("|")
    }
    val df2 = entityReferenceSlots.filter(msdf.df.columns.contains)
      .foldLeft(msdf.df)((d, c) => d.withColumn(c, remap(col(c))))
    // reference ends with standardize_references() on the rewired
    // converter (util.py:1596) — data AND metadata
    standardizeAll(Msdf(df2, msdf.meta, newPrefixes))
  }

  /** Per-column OR of LIKE patterns, AND across columns
    * (reference `filter_file`, io.py:328-374).
    */
  def likeFilter(df: DataFrame, patterns: Map[String, Seq[String]]): DataFrame = {
    val cond = patterns.map { case (c, pats) =>
      pats.map(p => col(c).like(p)).reduce(_ || _)
    }.reduce(_ && _)
    df.filter(cond)
  }

  /** Recursively resolve CURIEs / IRIs / files-of-either to a sorted
    * distinct IRI list (reference `extract_iris`, src/sssom/io.py:206-231).
    * Driver-side: the inputs are option-scale (a predicate list), never
    * data-scale.
    */
  def extractIris(inputs: Seq[String], prefixes: PrefixMap): Seq[String] = {
    def one(in: String): Seq[String] = {
      val p = java.nio.file.Paths.get(in)
      if (java.nio.file.Files.isRegularFile(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(p).asScala.toSeq
          .filter(_.nonEmpty).flatMap(one)
      }
      else if (PrefixMap.looksLikeIri(in)) Seq(in)
      else if (PrefixMap.looksLikeCurie(in))
        prefixes.expand(in).toSeq // unknown prefix → skipped (ref warns)
      else Seq.empty
    }
    inputs.flatMap(one).distinct.sorted
  }

  /** Keep rows whose predicate is in the given CURIE/IRI/file list — the
    * parse-time predicate filter (reference parsers.py:699-700, 762-763:
    * `mapping_predicates = extract_iris(...)`). The resolved list is a
    * broadcast-size `isin` against the standardized predicate column.
    */
  def filterByPredicates(df: DataFrame, predicates: Seq[String],
      prefixes: PrefixMap): DataFrame = {
    val iris = extractIris(predicates, prefixes)
    // match either spelling of each predicate (CURIE or IRI)
    val accepted = (iris ++ iris.flatMap(prefixes.compress)).distinct
    df.filter(col(PredicateId).isin(accepted: _*))
  }
}
