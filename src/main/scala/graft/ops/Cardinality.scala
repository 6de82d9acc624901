package graft.ops

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `mapping_cardinality` inference (reference `infer_cardinality`,
  * src/sssom/util.py:382-479): label each record 1:1 / 1:n / n:1 / n:n /
  * 0:1 / 1:0 / 0:0 from the count of distinct partners on each side.
  *
  * The reference's two `iterrows()` passes become two distinct-count
  * aggregations joined back on the side keys — fully distributed, two
  * shuffles, no driver state.
  */
object Cardinality {
  import Schema._

  private def hasCol(df: DataFrame, c: String) = df.columns.contains(c)
  private def colOr(df: DataFrame, c: String) =
    if (hasCol(df, c)) col(c) else lit("")

  /** Side key: literals keyed by label with an `L`/`E` discriminator
    * (reference util.py:419-429), plus scope slot values.
    */
  private def sideKey(df: DataFrame, side: String, scope: Seq[String]) = {
    val base = when(colOr(df, s"${side}_type") === RdfsLiteral,
      concat(lit("L\u0000"), colOr(df, s"${side}_label")))
      .otherwise(concat(lit("E\u0000"), colOr(df, s"${side}_id")))
    scope.foldLeft(base)((acc, s) =>
      concat(acc, lit("\u0000"), colOr(df, s)))
  }

  def inferCardinality(df: DataFrame, scope: Seq[String] = Seq.empty): DataFrame = {
    val validScope = scope.filter(mappingSlots.contains)
    val subjKey = sideKey(df, "subject", validScope)
    val objKey = sideKey(df, "object", validScope)

    // keyed is consumed from three branches (two partner-count aggs plus
    // the join-back); materialize expensive upstreams once (no-CSE rule,
    // see SparkUtil.materializeOnce — scan-shaped inputs pass through)
    val keyed = SparkUtil.materializeOnce(df
      .withColumn("__subj_key", subjKey)
      .withColumn("__obj_key", objKey))
    // NoTermFound rows are excluded from partner counting (util.py:433-436)
    val counted = keyed.filter(
      colOr(df, SubjectId) =!= NoTermFound && colOr(df, ObjectId) =!= NoTermFound)

    val subjectsPerObject = counted.groupBy(col("__obj_key"))
      .agg(countDistinct(col("__subj_key")).as("__n_subjects"))
    val objectsPerSubject = counted.groupBy(col("__subj_key"))
      .agg(countDistinct(col("__obj_key")).as("__n_objects"))

    val joined = keyed
      .join(subjectsPerObject, Seq("__obj_key"), "left")
      .join(objectsPerSubject, Seq("__subj_key"), "left")

    val card =
      when(colOr(df, SubjectId) === NoTermFound &&
        colOr(df, ObjectId) === NoTermFound, "0:0")
        .when(colOr(df, SubjectId) === NoTermFound, "0:1")
        .when(colOr(df, ObjectId) === NoTermFound, "1:0")
        .when(col("__n_subjects") === 1 && col("__n_objects") === 1, "1:1")
        .when(col("__n_subjects") === 1, "1:n")
        .when(col("__n_objects") === 1, "n:1")
        .otherwise("n:n")

    val out = joined.withColumn(MappingCardinality, card)
      .drop("__subj_key", "__obj_key", "__n_subjects", "__n_objects")
    if (validScope.nonEmpty)
      out.withColumn(CardinalityScope, lit(validScope.mkString("|")))
    else out.drop(CardinalityScope)
  }
}
