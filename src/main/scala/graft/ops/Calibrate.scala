package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source score calibration — quantile-normalize a quality signal
  * WITHIN each source before applying a global threshold. Heterogeneous
  * corpora score on different scales per source (a forum's median
  * "quality" is not a textbook's); filtering on the raw score keeps
  * whole sources and drops whole sources. The standard fix is to rank
  * each document against its own source: `pct_pm` = 1000 · |{d' in the
  * same source : score(d') < score(d)}| div (n_source − 1) — the
  * min-rank percentile in integer permille. Ties share a value and the
  * result needs NO document ordering, so it is partition-invariant and
  * engine-exact (a row_number formulation would need an id tiebreak and
  * would hand one task an entire source's rows).
  *
  * Scale shape: the ONLY corpus-sized exchange is the (source, score)
  * count aggregation (partial-agg, map-side combined). The rank math
  * runs over the counts table — |sources| × |distinct scores| rows, so
  * the per-source window is bounded by score cardinality, never by
  * document count — and maps back onto the corpus with a (source,
  * score) equi-join that AQE broadcasts when the counts table is small
  * (no forced hint: an unbounded-cardinality score column must not be
  * force-broadcast). Contract: `scoreCol` is an integer signal of
  * bounded cardinality (a heuristic score, a permille, a bucketed
  * length) — exactly what pipeline quality signals are.
  *
  * @return (idCol, sourceCol, scoreCol, pct_pm); single-document
  *         sources calibrate to 0.
  */
object Calibrate {

  def permilleRankBySource(df: DataFrame, scoreCol: String,
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(!df.columns.exists(_.startsWith("__cal_")),
      "input already has a __cal_ column (reserved by permilleRankBySource)")
    val counts = df.groupBy(col(sourceCol), col(scoreCol))
      .agg(count(lit(1)).as("__cal_n"))
    val below = Window.partitionBy(col(sourceCol))
      .orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col(sourceCol))
    val ranks = counts
      .withColumn("__cal_below",
        coalesce(sum(col("__cal_n")).over(below), lit(0L)))
      .withColumn("__cal_total", sum(col("__cal_n")).over(whole))
      .select(col(sourceCol), col(scoreCol),
        col("__cal_below"), col("__cal_total"))
    df.select(col(idCol), col(sourceCol), col(scoreCol))
      .join(ranks, Seq(sourceCol, scoreCol))
      .select(col(idCol), col(sourceCol), col(scoreCol),
        when(col("__cal_total") > 1,
          expr("(__cal_below * 1000) div (__cal_total - 1)"))
          .otherwise(lit(0L)).as("pct_pm"))
  }
}
