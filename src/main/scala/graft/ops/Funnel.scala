package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SparkUtil.materializeOnce

/** Ordered conversion funnel over an event stream: for an ordered step
  * list (e.g. signup → click → purchase), count the users who complete
  * each prefix of the steps IN EVENT-TIME ORDER, optionally within a
  * max gap per hop (the windowed-funnel semantics of the analytics
  * engines). A step-i event QUALIFIES when some qualifying step-(i-1)
  * event of the same user precedes it strictly, and — with a window —
  * by at most `maxGapMicros`. Qualifying sets, not earliest-completion
  * chains: with a per-hop window the greedy-earliest anchor is not
  * optimal (an early step-1 event can strand a conversion a later one
  * would allow), so each stage keeps EVERY qualifying event, which is
  * exact for any window. Without a window the two semantics count the
  * same users (greedy-earliest is optimal when nothing expires).
  *
  * Scale shape: stage i is a left-semi equi-join keyed on the user —
  * the type filter reaches the scan (a type-partitioned layout prunes),
  * the range predicate rides as the residual condition of the hash
  * join, and semi-join output is a SUBSET of the stage's own events
  * (never a fan-out). Per-stage state is the user's qualifying events
  * of one type — bounded by per-user activity, not corpus size. Stage
  * tables are multi-consumer (next stage + their own count), so
  * `materializeOnce` caps each at one execution.
  *
  * Determinism: set semantics and timestamp comparisons only — no
  * tie-break, no floats.
  *
  * @param steps        ordered distinct event types forming the funnel
  * @param maxGapMicros per-hop window in microseconds; 0 = unwindowed
  * @return one row per step: (step 1-based, event_type, users).
  */
object Funnel {

  def funnelCounts(events: DataFrame, steps: Seq[String],
      maxGapMicros: Long = 0L, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame =
    funnelCounts(events, steps, maxGapMicros, userCol, typeCol, tsCol,
      materialize = true)

  /** `materialize = false` keeps the stage lineage visible end-to-end —
    * the plan-audit hook (a checkpoint boundary hides the stage joins
    * from the final plan); production callers always materialize.
    */
  private[graft] def funnelCounts(events: DataFrame, steps: Seq[String],
      maxGapMicros: Long, userCol: String, typeCol: String, tsCol: String,
      materialize: Boolean): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct, got $steps")
    require(maxGapMicros >= 0L, s"need maxGapMicros >= 0, got $maxGapMicros")
    def mat(df: DataFrame) = if (materialize) materializeOnce(df) else df
    def stage(st: String) = events.filter(col(typeCol) === st)
      .select(col(userCol).as("u"), col(tsCol).cast("timestamp").as("t"))
    val first = mat(stage(steps.head))
    val stages: Seq[DataFrame] = steps.tail.scanLeft(first) { (prev, st) =>
      val p = prev.select(col("u").as("pu"), col("t").as("pt"))
      val window =
        if (maxGapMicros > 0L)
          unix_micros(col("t")) <= unix_micros(col("pt")) + maxGapMicros
        else lit(true)
      mat(stage(st).join(p,
        col("u") === col("pu") && col("pt") < col("t") && window,
        "left_semi"))
    }
    stages.zipWithIndex.map { case (df, i) =>
      df.agg(countDistinct(col("u")).as("users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col("users"))
    }.reduce(_ unionByName _)
  }
}
