package graft.ops

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KBOOM ptable export: collapse to (S,P,O, max confidence), then derive the
  * four probabilities (subclass, superclass, equivalent, sibling) from the
  * predicate class (reference `dataframe_to_ptable`,
  * src/sssom/util.py:953-1059). Pure column arithmetic after the collapse
  * aggregate — whole-stage-codegen friendly.
  */
object Ptable {
  import Schema._

  private val SubclassPreds = Seq(RdfsSubclassOf, SkosBroadMatch)
  private val SuperclassPreds = Seq(SkosNarrowMatch)
  private val EquivalentPreds =
    Seq(OwlEquivalentClass, SkosExactMatch, SkosCloseMatch, OboHasDbXref,
      SkosRelatedMatch)
  private val SiblingPreds = Seq(OwlDifferentFrom)

  def toPtable(df: DataFrame, inverseFactor: Double = 0.5,
      defaultConfidence: Option[Double] = None): DataFrame = {
    val withConf = defaultConfidence match {
      case Some(d) if df.columns.contains(Confidence) =>
        df.withColumn(Confidence, coalesce(col(Confidence), lit(d)))
      case Some(d) => df.withColumn(Confidence, lit(d))
      case None => df
    }
    val collapsed = MergeReconcile.collapse(withConf)

    val conf = col(Confidence)
    val inv = (lit(1.0) - conf) * lit(inverseFactor)
    val resid = (lit(1.0) - (conf + inv)) / lit(2.0)

    val p = col(PredicateId)
    val isSub = p.isin(SubclassPreds: _*)
    val isSuper = p.isin(SuperclassPreds: _*)
    val isEquiv = p.isin(EquivalentPreds: _*)
    val isSibling = p.isin(SiblingPreds: _*)

    // reference raises ValueError on any unhandled predicate
    // (util.py:1009-1010) rather than silently dropping the row
    val unhandled = collapsed
      .filter(!(isSub || isSuper || isEquiv || isSibling))
      .select(PredicateId).distinct().limit(5)
      .collect().map(_.getString(0))
    if (unhandled.nonEmpty)
      throw new IllegalArgumentException(
        s"Unhandled predicate(s) for ptable export: ${unhandled.mkString(", ")}")

    collapsed
      .select(
        col(SubjectId), col(ObjectId),
        when(isSub, conf).when(isSuper, inv).otherwise(resid)
          .as("p_subclass"),
        when(isSub, inv).when(isSuper, conf).otherwise(resid)
          .as("p_superclass"),
        when(isSub || isSuper, resid).when(isSibling, inv).otherwise(conf)
          .as("p_equivalent"),
        when(isSub || isSuper, resid).when(isSibling, conf).otherwise(inv)
          .as("p_sibling"))
  }
}
