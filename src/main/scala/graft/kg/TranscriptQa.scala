package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript well-formedness audit over the north-rule input table
  * (conv_id, turn_idx, role, text, tool, ts): the ingest gate a 10¹²-turn
  * pipeline runs BEFORE mention detection, because every downstream
  * contract — "stable (conv_id, turn_idx) window ordering preserving
  * per-turn text equality" — silently breaks on malformed conversations
  * rather than failing. Per conversation it checks that
  *
  *  - `turn_idx` starts at 0 and is contiguous with no duplicates (the
  *    stable-ordering precondition),
  *  - `ts` is non-decreasing in turn order (event time agrees with the
  *    declared order),
  *  - roles strictly alternate (no two consecutive turns share a role),
  *  - every role is from the allowed set,
  *  - no turn has null/blank text.
  *
  * Scale shape: ONE shuffle — a window partitioned by `conv_id` for the
  * lag comparisons, whose exchange the per-conv aggregate then reuses
  * (same key, no second shuffle). Conversations are bounded (thousands
  * of turns, not billions), so per-conv window state is safe at any
  * corpus size; there is no global sort and no driver state. The lag
  * order is the full (turn_idx, ts, role, text) tuple so duplicate
  * turn_idx rows still audit deterministically under any partitioning
  * (genuinely identical rows are interchangeable).
  *
  * @return one row per conversation: (conv_id, n_turns, starts_at_zero,
  *         contiguous, ts_monotone, roles_alternate, roles_known,
  *         text_nonempty, wellformed).
  */
object TranscriptQa {

  val checkCols: Seq[String] = Seq("starts_at_zero", "contiguous",
    "ts_monotone", "roles_alternate", "roles_known", "text_nonempty")

  def audit(transcripts: DataFrame,
      allowedRoles: Seq[String] = Seq("user", "assistant")): DataFrame = {
    require(allowedRoles.nonEmpty, "need at least one allowed role")
    val w = Window.partitionBy("conv_id")
      .orderBy(col("turn_idx").asc, col("ts").asc, col("role").asc,
        col("text").asc)
    val n = count(lit(1))
    val lagged = transcripts
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("ts"))
      .withColumn("__pts", lag(col("ts"), 1).over(w))
      .withColumn("__prole", lag(col("role"), 1).over(w))
    lagged.groupBy("conv_id").agg(
      n.as("n_turns"),
      (min(col("turn_idx")) === 0).as("starts_at_zero"),
      // max = n-1 AND all-distinct: a duplicate index plus a gap can
      // fake the max check alone
      (max(col("turn_idx")) === n - 1 &&
        countDistinct(col("turn_idx")) === n).as("contiguous"),
      // min over booleans = conjunction (false < true)
      min(col("__pts").isNull || col("__pts") <= col("ts"))
        .as("ts_monotone"),
      min(col("__prole").isNull || col("__prole") =!= col("role"))
        .as("roles_alternate"),
      min(col("role").isin(allowedRoles: _*)).as("roles_known"),
      min(col("text").isNotNull && length(trim(col("text"))) > 0)
        .as("text_nonempty"))
      .withColumn("wellformed",
        checkCols.map(col).reduce(_ && _))
  }

  /** One-row corpus summary (convs, turns, per-check violation counts,
    * malformed conv count) — the shape a pipeline ledger records per
    * ingest batch.
    */
  def auditSummary(transcripts: DataFrame,
      allowedRoles: Seq[String] = Seq("user", "assistant")): DataFrame = {
    val a = audit(transcripts, allowedRoles)
    val viols = checkCols.map(c =>
      sum((!col(c)).cast("long")).as(s"bad_$c"))
    val aggs = count(lit(1)).as("n_convs") +:
      sum(col("n_turns")).as("n_turns") +:
      (viols :+ sum((!col("wellformed")).cast("long")).as("malformed"))
    a.agg(aggs.head, aggs.tail: _*)
  }
}
