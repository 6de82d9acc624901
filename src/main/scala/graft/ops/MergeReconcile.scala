package graft.ops

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Merge, dedup and confidence/negation reconciliation.
  *
  * Spark-first re-expression of the reference's pandas reconcile dataflow:
  *   - `merge_msdf` (reference: src/sssom/util.py:1074-1123)
  *   - `filter_redundant_rows` (src/sssom/util.py:693-779)
  *   - `deal_with_negation` (src/sssom/util.py:1126-1271)
  *   - `collapse` (src/sssom/util.py:676-679)
  *   - `remove_mappings` (src/sssom/util.py:292-316)
  *   - `compare_dataframes` diff (src/sssom/util.py:863-932)
  *
  * Scale notes: groupBy-max + join-back replaces the reference's
  * driver-side max map (map-side partial aggregation, AQE-splittable
  * joins, no window partitions anywhere in the reconcile);
  * the per-entity-pair negation reconcile runs as `flatMapGroups` keyed by
  * (subject_id, object_id) — group sizes are bounded by per-pair mapping
  * multiplicity (tiny), so the shuffle partitions evenly at any scale.
  * The reference's nondeterministic `.sample()` tie-break
  * (util.py:1216-1217) is replaced by a total deterministic order.
  */
object MergeReconcile {

  import Schema._

  private def hasCol(df: DataFrame, c: String): Boolean = df.columns.contains(c)

  private def colOr(df: DataFrame, c: String, default: String = "") =
    if (hasCol(df, c)) col(c) else lit(default)

  /** Split rows by null confidence, adding the column if absent (reference
    * `assign_default_confidence`, src/sssom/util.py:813-833).
    */
  private def splitByConfidence(df: DataFrame): (DataFrame, DataFrame, Boolean) = {
    val had = hasCol(df, Confidence)
    if (had)
      (df.filter(col(Confidence).isNotNull), df.filter(col(Confidence).isNull), had)
    else
      // reference fills 0.0 (not NaN) when the column is absent, with an
      // empty NaN side (util.py:828-830)
      (df.withColumn(Confidence, lit(0.0)), df.withColumn(Confidence,
        lit(0.0)).limit(0), had)
  }

  /** groupBy (S,P,O) → max(confidence) (reference `collapse`). */
  def collapse(df: DataFrame): DataFrame =
    df.groupBy(TripleIds.map(col): _*)
      .agg(max(col(Confidence)).as(Confidence))

  /** Remove rows with a matching row in `remove` on KEY_FEATURES
    * (reference `remove_mappings`): a distributed anti-join.
    */
  def removeMappings(df: DataFrame, remove: DataFrame): DataFrame = {
    val keys = KeyFeatures.filter(k => hasCol(df, k) && hasCol(remove, k))
    df.join(remove.select(keys.map(col): _*).distinct(), keys, "left_anti")
  }

  private def materializeOnce(df: DataFrame): DataFrame =
    SparkUtil.materializeOnce(df)

  /** Keep only rows whose confidence equals the (S,O[,P]) group max;
    * null-confidence rows bypass; then single-predicate reconciliation of
    * equal-confidence groups by predicate hierarchy
    * (reference `filter_redundant_rows`).
    */
  def filterRedundantRows(dfIn: DataFrame, ignorePredicate: Boolean = false): DataFrame = {
    val hadConf = hasCol(dfIn, Confidence)
    // reference fills 0.0 when the column is absent (util.py:828-830)
    val df = if (hadConf) dfIn else dfIn.withColumn(Confidence, lit(0.0))
    val key = if (ignorePredicate) Seq(SubjectId, ObjectId)
      else Seq(SubjectId, ObjectId, PredicateId)

    // group-max + join-back instead of the reference's collected max-dict.
    // Deliberately NOT a window: window partitions get no partial
    // aggregation and AQE never splits them, so one hot (S,O,P) key (10%
    // head-entity mentions in the KG workload) floods a single task at
    // scale. groupBy(max) combines map-side and the join-back is an AQE
    // skew-splittable equi-join — same rows, skew-immune.
    //
    // The null-confidence bypass is fused into the join-back (r6): max()
    // skips nulls, so group maxes over ALL rows equal the old nonNull-side
    // maxes, and a LEFT join + (conf IS NULL OR conf >= max) filter emits
    // exactly the old kept ∪ nanRows — null-conf rows pass (their group
    // max may even be null), non-null rows keep the group-max test, and
    // rows whose key columns contain NULL fail the equi-join and the >=
    // against a null max exactly as they failed the old inner join. This
    // removes the isNull/isNotNull double scan of the input and both
    // localCheckpoint barriers: each upstream subtree below is consumed
    // from two plan branches, but the branches are canonically identical,
    // so AQE's shuffle-stage reuse executes each exchange once (verified
    // in the executed plan: ReusedQueryStage/ReusedExchange nodes).
    val maxes = df.groupBy(key.map(col): _*)
      .agg(max(col(Confidence)).as("__max_conf"))
    val confReconciled = df
      .join(maxes, key, "left")
      .filter(col(Confidence).isNull || col(Confidence) >= col("__max_conf"))
      .drop("__max_conf")
      .select(df.columns.map(col).toIndexedSeq: _*)
      .dropDuplicates()

    // Equal-confidence multi-predicate group pick, fused into ONE
    // aggregation + ONE null-safe equi-join (replaces the groups agg +
    // anti-join + semi-join + min agg + join-back + final dedup shape: 6
    // exchanges and 3 branch-references over confReconciled became 2 and
    // 2). Per (S,O,conf) group the agg computes
    //   __n        — predicate count over non-"Not" rows with non-null
    //                confidence (pandas groupby drops NaN keys, and the
    //                =!= comparison drops null modifiers exactly like the
    //                filter it replaces);
    //   __min_rank — the hierarchy minimum over ALL rows of the group
    //                (the semantics of the semi-join + min agg it fuses).
    // A row survives iff its group is not a multi-predicate group
    // (__n <= 1 — null-conf rows always land here, their __n counts
    // nothing) or it carries the group's best-ranked predicate. The join
    // uses null-safe equality on every key so null subjects/objects/
    // confidences match the groupBy keys they came from; one stats row
    // exists per key, so row multiplicity is preserved and the input's
    // distinctness makes the old trailing dropDuplicates a no-op.
    val rank = coalesce(
      element_at(typedLit(Schema.predicateRank), col(PredicateId)),
      lit(Int.MaxValue))
    val pmNotNot =
      if (hasCol(confReconciled, PredicateModifier))
        col(PredicateModifier) =!= PredicateModifierNot
      else lit(true)
    val stats = confReconciled
      .withColumn("__rank", rank)
      .groupBy(col(SubjectId), col(ObjectId), col(Confidence))
      .agg(
        count(when(pmNotNot && col(Confidence).isNotNull,
          col(PredicateId))).as("__n"),
        min(col("__rank")).as("__min_rank"))
      .select(col(SubjectId).as("__s"), col(ObjectId).as("__o"),
        col(Confidence).as("__c"), col("__n"), col("__min_rank"))
    val result = confReconciled
      .withColumn("__rank", rank)
      .join(stats, col(SubjectId) <=> col("__s") &&
        col(ObjectId) <=> col("__o") && col(Confidence) <=> col("__c"))
      .filter(col("__n") <= 1 || col("__rank") === col("__min_rank"))
      .select(confReconciled.columns.map(col).toIndexedSeq: _*)
    if (hadConf) result else result.drop(Confidence)
  }

  /** Negation reconcile: for each (subject, object) pair resolve positive vs
    * `Not`-modified rows — higher confidence wins; on ties prefer
    * ManualMappingCuration; negative trumps positive
    * (reference `deal_with_negation`; deterministic tie-break replaces
    * `.sample()`).
    */
  def dealWithNegation(dfIn: DataFrame): DataFrame = {
    if (!hasCol(dfIn, PredicateModifier)) return dfIn
    val spark = dfIn.sparkSession
    import spark.implicits._

    // consumed from the pos/neg split and the re-join branches below
    val df = materializeOnce(dfIn)
    val (nonNull, nanRows, hadConf) = splitByConfidence(df)
    val workCols = nonNull.columns.toSeq

    val negRows = nonNull.filter(col(PredicateModifier) === PredicateModifierNot)
    val posRows = nonNull.filter(col(PredicateModifier) =!= PredicateModifierNot)

    def subset(d: DataFrame, kind: String): DataFrame =
      d.select(col(SubjectId), col(ObjectId), col(PredicateId),
        col(Confidence), colOr(d, MappingJustification).as(MappingJustification),
        lit(kind).as("__kind"))

    // combined candidate subset (positive first, reference concat order),
    // plus negation-confidence markers used for the re-negate step
    val combined = subset(posRows, "C")
      .unionByName(subset(negRows, "C"))
      .dropDuplicates(Seq(SubjectId, ObjectId, PredicateId, Confidence,
        MappingJustification))
    val negMarks = negRows
      .select(col(SubjectId), col(ObjectId), lit("").as(PredicateId),
        col(Confidence), lit("").as(MappingJustification), lit("N").as("__kind"))
      .distinct()

    val all = combined.unionByName(negMarks)
      .as[(String, String, String, Double, String, String)]

    // per-(S,O) group resolution; group sizes = per-pair mapping counts
    val resolved: Dataset[(String, String, String, Double, String, String)] =
      all.groupByKey { case (s, o, _, _, _, _) => (s, o) }
        .flatMapGroups { (_: (String, String), it: Iterator[(String, String, String, Double, String, String)]) =>
          val rows = it.toVector
          val members = rows.filter(_._6 == "C")
          val negConfs = rows.filter(_._6 == "N").map(_._4).toSet
          // reference iterates per (S,P,O)-max row; match set keyed (S,O,conf)
          val maxByPred: Map[String, Double] =
            members.groupBy(_._3).map { case (p, g) => p -> g.map(_._4).max }
          // one emission per (S,P,O) max-confidence row, multiplicity kept
          // (the reference accumulates without dedup, util.py:1229-1238);
          // deterministic iteration: predicates by hierarchy rank then name
          val out = Vector.newBuilder[(String, String, String, Double, String)]
          val preds = maxByPred.keys.toSeq.sortBy(p =>
            (Schema.predicateRank.getOrElse(p, Int.MaxValue), p))
          preds.foreach { p =>
            val c = maxByPred(p)
            val matched = members.filter(_._4 == c)
            val pick =
              if (matched.size <= 1) matched
              else {
                val manual = matched.filter(_._5 == JustificationManual)
                if (manual.size <= 1) manual
                else Seq(manual.minBy(r =>
                  (Schema.predicateRank.getOrElse(r._3, Int.MaxValue), r._3, r._5)))
              }
            pick.foreach(r => out += ((r._1, r._2, r._3, r._4, r._5)))
          }
          out.result().map { case (su, ob, p, c, j) =>
            val modifier = if (negConfs.contains(c)) PredicateModifierNot else ""
            (su, ob, p, c, j, modifier)
          }
        }

    val emitted = resolved.toDF(SubjectId, ObjectId, PredicateId, Confidence,
      MappingJustification, PredicateModifier)

    // recover full-width rows: the reference right-merges df onto the
    // reconciled subset (util.py:1259-1261) — matching pairs multiply,
    // unmatched reconciled rows survive with empty side columns
    val joinKeys = Seq(SubjectId, ObjectId, PredicateId, Confidence,
      MappingJustification, PredicateModifier)
      .filter(k => hasCol(nonNull, k))
    val matched = nonNull.join(emitted.select(joinKeys.map(col): _*),
      joinKeys, "inner")
    val unmatched = emitted.join(nonNull.select(joinKeys.map(col): _*).distinct(),
      joinKeys, "left_anti")
    val widened = nonNull.columns.foldLeft(unmatched) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c,
        if (Schema.doubleSlots.contains(c)) lit(null).cast(DoubleType)
        else lit(""))
    }.select(matched.columns.map(col): _*)

    val reconciled = matched.unionByName(widened)
    val withNan =
      if (nanRows.isEmpty) reconciled
      else reconciled.unionByName(nanRows).dropDuplicates()
    if (hadConf) withNan else withNan.drop(Confidence)
  }

  /** Merge N mapping sets: propagate, inject `mapping_source`, union by
    * name with missing columns, dedup over the shared column set (excluding
    * an injected mapping_source when ≥2 sets got one), optional reconcile
    * (reference `merge_msdf`).
    */
  def merge(msdfs: Seq[Msdf], reconcile: Boolean = false): Msdf = {
    require(msdfs.nonEmpty)
    var sourceInjected = 0
    val prepared = msdfs.map { m0 =>
      val m = m0.propagate()
      val setId = m.metaMap.get("mapping_set_id").map(_.asString)
      if (setId.isDefined && !hasCol(m.df, MappingSource)) {
        sourceInjected += 1
        m.withDf(m.df.withColumn(MappingSource, lit(setId.get)))
      } else m
    }
    val allColumns = prepared.flatMap(_.df.columns).distinct
    val dedupCols =
      if (sourceInjected > 1) allColumns.filterNot(_ == MappingSource)
      else allColumns

    val unioned = prepared.map(_.df)
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    // absent columns materialize as null after unionByName; restore the
    // ""-for-absent string discipline
    val filled = unioned.select(unioned.columns.map { c =>
      if (Schema.doubleSlots.contains(c)) col(c)
      else coalesce(col(c), lit("")).as(c)
    }.toIndexedSeq: _*)
    val merged = filled.dropDuplicates(dedupCols)

    val prefixes = prepared.map(_.prefixes).reduce(_ chain _)
    val meta = prepared.head.meta
    val out = Msdf(merged, meta, prefixes)
    if (!reconcile) out
    else
      // NOTE: the reference guards its negation step with
      // `PREDICATE_MODIFIER_NOT in df[PREDICATE_MODIFIER]` (util.py:1116-1119),
      // which tests the pandas *index*, never the values — so
      // `deal_with_negation` is unreachable from merge at runtime and the
      // reconciled merge is exactly `filter_redundant_rows`. We mirror the
      // runtime behavior; `dealWithNegation` stays available standalone.
      out.withDf(filterRedundantRows(merged))
  }

  /** Entity-pair diff of two mapping sets (reference `compare_dataframes`):
    * unordered (subject, object) entity pairs — entities carry id, label,
    * category and source — labeled UNIQUE_1 / UNIQUE_2 / COMMON_TO_BOTH.
    * Implemented as distinct-key anti/semi joins, no driver iteration.
    */
  def diff(df1: DataFrame, df2: DataFrame): MappingSetDiff = {
    // Reference `EntityPair` has a symmetric __hash__ but the default
    // dataclass ordered __eq__, and `create_entity` reduces to the bare id
    // string (util.py:641-656, 848-860) — so the effective diff key is the
    // ORDERED (subject_id, object_id) pair of ids.
    def pairKey(df: DataFrame) =
      struct(colOr(df, SubjectId).as("s"), colOr(df, ObjectId).as("o"))
    // each key set feeds three branches (both uniques + common) and each
    // unique set three more (two annotate joins + its count) — without
    // boundaries the distincts re-execute ~6× (no-CSE rule)
    val k1 = SparkUtil.materializeOnce(
      df1.select(pairKey(df1).as("__pair")).distinct())
    val k2 = SparkUtil.materializeOnce(
      df2.select(pairKey(df2).as("__pair")).distinct())
    val unique1 = SparkUtil.materializeOnce(k1.join(k2, Seq("__pair"), "left_anti"))
    val unique2 = SparkUtil.materializeOnce(k2.join(k1, Seq("__pair"), "left_anti"))
    val common = k1.join(k2, Seq("__pair"), "left_semi") // consumed once

    def annotate(df: DataFrame, uniques: DataFrame, uniqueLabel: String) = {
      val keyed = df.withColumn("__pair", pairKey(df))
      val u = keyed.join(uniques, Seq("__pair"), "left_semi")
        .withColumn(Comment, lit(uniqueLabel))
      val c = keyed.join(uniques, Seq("__pair"), "left_anti")
        .withColumn(Comment, lit("COMMON_TO_BOTH"))
      u.unionByName(c).drop("__pair")
    }
    val combined = annotate(df1, unique1, "UNIQUE_1")
      .unionByName(annotate(df2, unique2, "UNIQUE_2"), allowMissingColumns = true)
      .dropDuplicates()
    MappingSetDiff(unique1.count(), unique2.count(), common.count(), combined)
  }

  final case class MappingSetDiff(
      nUnique1: Long, nUnique2: Long, nCommon: Long, combined: DataFrame)
}
