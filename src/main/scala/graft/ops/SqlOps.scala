package graft.ops

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL entry points, split, crosstab/correlation and metadata annotation.
  *
  * References: `run_sql_query` (src/sssom/io.py:280-325), `split_dataframe`
  * / `split_dataframe_by_prefix` (src/sssom/parsers.py:1003-1122),
  * crosstab/correlations (src/sssom/cli.py:478-535), `augment_metadata`
  * (src/sssom/util.py:1668-1702), `enforce_version` (util.py:508-575).
  */
object SqlOps {
  import Schema._

  /** dosql: register each msdf as dfN (and its stem name) and run SQL
    * through Catalyst (reference run_sql_query).
    */
  def dosql(spark: SparkSession, query: String,
      tables: Map[String, DataFrame]): DataFrame = {
    var i = 0
    tables.foreach { case (name, df) =>
      i += 1
      df.createOrReplaceTempView(s"df$i")
      df.createOrReplaceTempView(name)
    }
    spark.sql(query)
  }

  /** Split into sub-sets keyed `{subjPrefix}_{predicateLocal}_{objPrefix}`
    * (reference split_dataframe_by_prefix; the boolean-mask/posting-list
    * index machinery is a pandas-ism — one hash aggregation does it here).
    */
  def splitKeys(df: DataFrame): DataFrame = {
    val sp = split(col(SubjectId), ":", 2).getItem(0)
    val op = split(col(ObjectId), ":", 2).getItem(0)
    val pl = regexp_replace(col(PredicateId), "^.*:", "")
    df.withColumn("__split",
      lower(concat(sp, lit("_"), pl, lit("_"), op)))
  }

  def splitDataframe(df: DataFrame): Map[String, DataFrame] = {
    val keyed = splitKeys(df)
    val keys = keyed.select("__split").distinct()
      .collect().map(_.getString(0))
    keys.map(k => k -> keyed.filter(col("__split") === k).drop("__split"))
      .toMap
  }

  /** Partitioned split write — the scale path: one shuffle, one pass. */
  def splitWrite(df: DataFrame, outDir: String): Unit =
    splitKeys(df).write.mode("overwrite").partitionBy("__split")
      .parquet(outDir)

  /** Contingency table of two columns, long form (reference cli.py:478-491;
    * `df.stat.crosstab` pivots, but long form feeds chi² directly and
    * stays shuffle-bounded for high-cardinality columns).
    */
  def crosstab(df: DataFrame, c1: String, c2: String): DataFrame =
    df.groupBy(col(c1), col(c2)).agg(count(lit(1)).as("n"))

  /** Pearson chi² over the two-column contingency table (reference
    * cli.py:494-535): expected = row_total·col_total/total, computed with
    * window sums — no driver-side table required.
    */
  def chiSquared(df: DataFrame, c1: String, c2: String): Double = {
    // contingency margins via aggregates + joins — no empty-partition
    // window (Window.partitionBy() forces everything onto one task and
    // WindowExec warns); the contingency table is tiny but the plan
    // pattern should stay scale-clean
    val ct = crosstab(df, c1, c2).localCheckpoint(true)
    val rowTotals = ct.groupBy(col(c1)).agg(sum("n").as("rt"))
    val colTotals = ct.groupBy(col(c2)).agg(sum("n").as("ctot"))
    val grand = ct.agg(sum("n").as("t"))
    val withExp = ct
      .join(rowTotals, c1)
      .join(colTotals, c2)
      .crossJoin(grand)
      .withColumn("expected", col("rt") * col("ctot") / col("t"))
      .withColumn("chi",
        (col("n") - col("expected")) * (col("n") - col("expected")) /
          col("expected"))
    withExp.agg(sum("chi")).collect()(0).getDouble(0)
  }

  /** Merge user parameters into set metadata; multivalued slots union
    * (reference augment_metadata / annotate).
    */
  def annotate(msdf: Msdf, params: Map[String, Seq[String]],
      replaceMultivalued: Boolean = false): Msdf = {
    val updated = params.foldLeft(msdf.meta) { case (meta, (k, vs)) =>
      val existing = meta.find(_._1 == k)
      val newVal: MetaValue = existing match {
        case Some((_, MetaList(old))) if !replaceMultivalued =>
          MetaList((old ++ vs).distinct)
        case _ if vs.length > 1 => MetaList(vs.toVector)
        case _ => MetaString(vs.headOption.getOrElse(""))
      }
      meta.filterNot(_._1 == k) :+ (k -> newVal)
    }
    msdf.copy(meta = updated)
  }

  /** Slots introduced after SSSOM 1.0 (subset of the schema's `added_in`
    * annotations) — dropped when enforcing version 1.0
    * (reference enforce_version, util.py:508-575).
    */
  private val slotsAddedIn11: Set[String] = Set(
    "predicate_type", "mapping_tool_id", "subject_field", "object_field",
    "similarity_score", "similarity_measure", "curation_rule",
    "curation_rule_text", "cardinality_scope", "record_id",
    "mapping_set_confidence", "publication_date")

  /** Enum values introduced after 1.0: (slot, value) pairs blanked when
    * enforcing 1.0 (reference NEW_ENUM_VALUES, constants.py:256-259).
    */
  private val enumValuesAddedIn11: Seq[(String, String)] = Seq(
    Schema.SubjectType -> "composed entity expression",
    Schema.ObjectType -> "composed entity expression",
    Schema.MappingCardinality -> "0:0")

  /** Minimum SSSOM version this set is compatible with (reference
    * `get_compatible_version`, util.py:481-506): 1.1 if any 1.1-only
    * slot is present, or any 1.1-only enum value occurs in the data;
    * else 1.0. The enum check is one distributed filter.
    */
  def getCompatibleVersion(msdf: Msdf): String = {
    val slotHit = msdf.df.columns.exists(slotsAddedIn11.contains) ||
      msdf.meta.exists(kv => slotsAddedIn11.contains(kv._1))
    if (slotHit) return "1.1"
    val enumCond = enumValuesAddedIn11
      .filter { case (slot, _) => msdf.df.columns.contains(slot) }
      .map { case (slot, v) => col(slot) === v }
      .reduceOption(_ || _)
    val enumHit = enumCond.exists(c => !msdf.df.filter(c).isEmpty) ||
      enumValuesAddedIn11.exists { case (slot, v) =>
        msdf.metaMap.get(slot).exists(_.asString == v)
      }
    if (enumHit) "1.1" else "1.0"
  }

  /** Spec versions the SSSOM model defines (reference SssomVersionEnum —
    * parse_sssom_version, constants.py:367-378, validates against it).
    */
  private val knownVersions = Set((1, 0), (1, 1))

  /** Parse "X.Y" into a comparable (major, minor) tuple, raising on
    * unparseable or unknown versions (reference `parse_sssom_version`,
    * constants.py:367-378, which rejects via the SssomVersionEnum).
    */
  def parseSssomVersion(version: String): (Int, Int) = {
    val parsed = version.split("\\.", -1) match {
      case Array(ma, mi) if ma.forall(_.isDigit) && mi.forall(_.isDigit) &&
        ma.nonEmpty && mi.nonEmpty => (ma.toInt, mi.toInt)
      case _ => throw new IllegalArgumentException(
        s"invalid SSSOM version string: '$version' (expected 'X.Y')")
    }
    if (!knownVersions.contains(parsed))
      throw new IllegalArgumentException(
        s"unknown SSSOM spec version: '$version' (known: 1.0, 1.1)")
    parsed
  }

  /** Force compliance with a target spec version (reference
    * `enforce_version`, util.py:508-575): slots added after the target
    * are dropped from table and metadata; enum values added after the
    * target are blanked in the remaining columns; `strict` additionally
    * drops unknown (non-schema) slots.
    */
  def enforceVersion(msdf: Msdf, version: String = "1.0",
      strict: Boolean = false): Msdf = {
    val target = parseSssomVersion(version)
    val pre11 = target._1 < 1 || (target._1 == 1 && target._2 < 1)
    val known = (Schema.mappingSlots ++ Schema.mappingSetSlots).toSet ++
      slotsAddedIn11
    def keep(name: String): Boolean = {
      if (known.contains(name)) !pre11 || !slotsAddedIn11.contains(name)
      else !strict // unknown slot: kept unless strict (no extension model)
    }
    val dropCols = msdf.df.columns.filterNot(keep)
    var df = msdf.df.drop(dropCols.toIndexedSeq: _*)
    if (pre11)
      enumValuesAddedIn11.foreach { case (slot, v) =>
        if (df.columns.contains(slot))
          df = df.withColumn(slot, when(col(slot) === v, lit("")).otherwise(col(slot)))
      }
    val meta = msdf.meta.filter(kv => keep(kv._1))
      .filterNot { case (k, mv) =>
        pre11 && enumValuesAddedIn11.contains((k, mv.asString))
      }
    Msdf(df, meta, msdf.prefixes)
  }
}
