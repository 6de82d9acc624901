package graft.ops

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triple emission — the reference's RDF "hydrate" rule re-expressed as the
  * engine's core output filter (reference: src/sssom/rdf_internal.py:946-970
  * via writers.py:131-163): a mapping row becomes a direct (s, p, o) triple
  * unless it is a literal mapping, carries a `Not` modifier, or involves
  * `sssom:NoTermFound`. CURIEs expand through the broadcast prefix map.
  */
object TripleEmit {
  import Schema._

  private def hasCol(df: DataFrame, c: String) = df.columns.contains(c)
  private def colOr(df: DataFrame, c: String) =
    if (df.columns.contains(c)) col(c) else lit("")

  /** Rows eligible for direct triple emission (missing id columns —
    * e.g. pure literal mapping sets — yield nothing).
    */
  def hydratable(df: DataFrame): DataFrame =
    df.filter(
      colOr(df, SubjectType) =!= RdfsLiteral &&
      colOr(df, ObjectType) =!= RdfsLiteral &&
      colOr(df, PredicateModifier) =!= PredicateModifierNot &&
      colOr(df, SubjectId) =!= NoTermFound &&
      colOr(df, ObjectId) =!= NoTermFound &&
      colOr(df, SubjectId) =!= "" && colOr(df, ObjectId) =!= "")

  /** Emit (subject, predicate, object) triples, optionally IRI-expanded. */
  def emit(df: DataFrame, prefixes: PrefixMap, expand: Boolean = true): DataFrame = {
    val base = hydratable(df)
      .select(colOr(df, SubjectId).as("subject"),
        colOr(df, PredicateId).as("predicate"),
        colOr(df, ObjectId).as("object"))
      .distinct()
    if (!expand) base
    else {
      val bc = df.sparkSession.sparkContext.broadcast(prefixes)
      val ex = udf((v: String) => bc.value.expandOrSelf(v))
      base.select(ex(col("subject")).as("subject"),
        ex(col("predicate")).as("predicate"),
        ex(col("object")).as("object"))
    }
  }
}
