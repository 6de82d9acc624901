package graft.ops

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mapping inversion: swap subject/object column families and map the predicate
  * through the inverse dictionary (reference `invert_mappings`,
  * src/sssom/util.py:1727-1812). Pure column renames + a broadcast-size
  * predicate map — no shuffle beyond the final dedup.
  */
object Invert {
  import Schema._

  private def hasCol(df: DataFrame, c: String) = df.columns.contains(c)

  /** Rename subject_*↔object_* per COLUMN_INVERT_DICTIONARY. */
  private def swapColumns(df: DataFrame): DataFrame = {
    val renamed = df.columns.map { c =>
      col(c).as(columnInvertMap.getOrElse(c, c))
    }
    df.select(renamed.toIndexedSeq: _*)
  }

  /** @param subjectPrefix if set, only invert rows whose object has the
    *   prefix and subject does not (and keep rows already prefixed);
    *   if unset, invert every row with an invertible predicate.
    * @param mergeInverted if true, union the inverted rows with the input.
    * @param updateJustification set justification to semapv:MappingInversion.
    */
  def invertMappings(
      df: DataFrame,
      subjectPrefix: Option[String] = None,
      mergeInverted: Boolean = true,
      updateJustification: Boolean = true,
      predicateInvertMap: Map[String, String] = Schema.predicateInvertMap)
      : DataFrame = {
    val invertible = col(PredicateId).isin(predicateInvertMap.keys.toSeq: _*)
    val modifierBlank =
      if (hasCol(df, PredicateModifier)) col(PredicateModifier) === ""
      else lit(true)
    val predicateModified =
      if (hasCol(df, PredicateModifier)) df.filter(col(PredicateModifier) =!= "")
      else df.limit(0)
    val nonModified = df.filter(modifierBlank)

    val (toInvert, keepAsIs) = subjectPrefix match {
      case Some(p) =>
        val subjHas = col(SubjectId).startsWith(p + ":")
        val objHas = col(ObjectId).startsWith(p + ":")
        (nonModified.filter(!subjHas && objHas && invertible),
          nonModified.filter(subjHas && !objHas))
      case None =>
        (nonModified.filter(invertible), nonModified.filter(!invertible))
    }

    val predMap = typedLit(predicateInvertMap)
    var inverted = swapColumns(toInvert)
      .withColumn(PredicateId, element_at(predMap, col(PredicateId)))
    if (updateJustification && hasCol(df, MappingJustification))
      inverted = inverted.withColumn(MappingJustification,
        lit(JustificationInversion))
    // restore original column order
    inverted = inverted.select(df.columns.map(col).toIndexedSeq: _*)

    val returned = subjectPrefix match {
      // reference branches on prefixed_subjects_df.empty (util.py:1804-1810):
      // nonempty → prefixed + inverted; empty → inverted + predicate-modified
      // (+ non-inverted-by-predicate, an empty frame in the prefix branch)
      case Some(_) if !keepAsIs.isEmpty =>
        keepAsIs.unionByName(inverted).dropDuplicates()
      case Some(_) =>
        inverted.unionByName(predicateModified).dropDuplicates()
      case None =>
        inverted.unionByName(predicateModified).unionByName(keepAsIs)
          .dropDuplicates()
    }
    if (mergeInverted) df.unionByName(returned).dropDuplicates()
    else returned
  }
}
