package graft.ops

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Validation operators (reference src/sssom/validators.py:100-235),
  * re-expressed as distributed error-row scans instead of exception-first
  * document validation: each validator returns a DataFrame of violations
  * (empty = valid), so validation of a 100 TB table is one pass that can
  * be acted on per-partition.
  */
object Validators {
  import Schema._

  final case class ValidationReport(
      prefixViolations: Seq[String], curieFormatViolations: Long,
      schemaViolations: Long) {
    def isValid: Boolean =
      prefixViolations.isEmpty && curieFormatViolations == 0 &&
        schemaViolations == 0
  }

  /** Prefixes used in the data but absent from the converter
    * (reference `check_all_prefixes_in_curie_map`, validators.py:150-176).
    */
  def missingPrefixes(msdf: Msdf): Seq[String] =
    (msdf.usedPrefixes -- msdf.prefixes.prefixes --
      PrefixMap.builtInPrefixes).toSeq.sorted

  /** Count of non-schema ("bad") attribute occurrences per column
    * (reference `_get_mapping_dict`'s bad_attrs Counter,
    * parsers.py:530-552: every row increments each column outside the
    * schema's mapping slots).
    */
  def badAttributeCounts(df: DataFrame): Map[String, Long] = {
    val bad = df.columns.filterNot(mappingSlots.contains)
    if (bad.isEmpty) Map.empty
    else {
      val n = df.count()
      bad.map(_ -> n).toMap
    }
  }

  /** Rows with a `|` inside single-valued EntityReference slots
    * (reference `check_strict_curie_format`, validators.py:179-226).
    * Returns (row key, column, offending value).
    */
  def strictCurieViolations(df: DataFrame): DataFrame = {
    val singleValuedRefs = entityReferenceSlots
      .filterNot(multivaluedSlots.contains)
      .filter(df.columns.contains)
    val checks = singleValuedRefs.map { c =>
      df.filter(col(c).contains("|"))
        .select(
          (if (df.columns.contains(SubjectId)) col(SubjectId) else lit(""))
            .as("subject_id"),
          (if (df.columns.contains(ObjectId)) col(ObjectId) else lit(""))
            .as("object_id"),
          lit(c).as("column"), col(c).as("value"))
    }
    if (checks.isEmpty)
      df.sparkSession.emptyDataFrame
        .withColumn("subject_id", lit(""))
        .withColumn("object_id", lit(""))
        .withColumn("column", lit("")).withColumn("value", lit(""))
    else checks.reduce(_ unionByName _)
  }

  /** Structural schema violations: missing required ids (unless a literal
    * mapping with a label), or an unknown predicate modifier — the residue
    * of the reference's LinkML JsonSchema check that is not already
    * guaranteed by our typed StructType (validators.py:100-119).
    */
  def schemaViolations(df: DataFrame): DataFrame = {
    def colOr(c: String) =
      if (df.columns.contains(c)) col(c) else lit("")
    val subjectBad =
      when(colOr(SubjectType) === RdfsLiteral, colOr(SubjectLabel) === "")
        .otherwise(colOr(SubjectId) === "")
    val objectBad =
      when(colOr(ObjectType) === RdfsLiteral, colOr(ObjectLabel) === "")
        .otherwise(colOr(ObjectId) === "")
    val modifierBad = !colOr(PredicateModifier).isin("", PredicateModifierNot)
    df.filter(subjectBad || objectBad || modifierBad)
  }

  /** Run all default validators (reference DEFAULT_VALIDATION_TYPES:
    * JsonSchema, PrefixMapCompleteness, StrictCurieFormat).
    */
  def validate(msdf: Msdf): ValidationReport =
    ValidationReport(
      missingPrefixes(msdf),
      strictCurieViolations(msdf.df).count(),
      schemaViolations(msdf.df).count())
}
