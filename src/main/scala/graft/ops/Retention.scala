package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SparkUtil.materializeOnce

/** Retention cohort matrix: users cohorted by the period of their FIRST
  * event; each cell (cohort_period, period_offset) counts the distinct
  * cohort users still active `offset` periods later — the standard
  * product-analytics retention triangle.
  *
  * Periods are integer epoch buckets (floor(unix_seconds div
  * periodSeconds)), not calendar truncation: pure long arithmetic, the
  * same on every engine and timezone, so the matrix hash-matches a SQL
  * oracle. Offset 0 always contains the full cohort.
  *
  * Scale shape: one per-user min aggregate (partial-agg, one shuffle on
  * the user key) whose output — one row per user — joins back to the
  * activity stream on the SAME user key (co-partitioned; AQE broadcasts
  * it when the user dimension is small), then one (cohort, offset)
  * partial-agg with a distinct whose expansion is bounded by
  * users × active-periods, already the input's order of magnitude. The
  * first-event table is multi-consumer in principle but consumed once
  * here; `materializeOnce` still caps the agg at one execution against
  * the count branch Catalyst would otherwise duplicate under the
  * distinct rewrite.
  *
  * @param periodSeconds cohort bucket width (e.g. 604800 = weekly)
  * @return (cohort_period, period_offset, users), offsets ≥ 0.
  */
object Retention {

  def cohorts(events: DataFrame, periodSeconds: Long = 604800L,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(periodSeconds > 0L, s"need periodSeconds > 0, got $periodSeconds")
    // `div` truncates toward zero where SQL floor-division floors — the
    // two agree on the non-negative epochs this targets (post-1970 data);
    // pre-epoch timestamps would bucket off-by-one vs a flooring oracle
    val pcol = expr(s"unix_seconds(cast($tsCol as timestamp)) div $periodSeconds")
    val first = materializeOnce(
      events.groupBy(col(userCol).as("u"))
        .agg(min(pcol).as("cohort_period")))
    events.select(col(userCol).as("u"), pcol.as("p"))
      .join(first, Seq("u"))
      .groupBy(col("cohort_period"), (col("p") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col("u")).as("users"))
  }
}
