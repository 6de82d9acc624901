package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream debounce dedup: drop an event when the PREVIOUS raw
  * event of the same key arrived within a time window — the standard
  * cleanup for at-least-once delivery (retried webhooks, double-fired
  * client events, duplicated log shipping). "Previous RAW event", not
  * "previous kept event": the lag-1 form is a pure window function —
  * one shuffle, engine-portable, DuckDB-oracle-able — where
  * kept-chaining is an inherently sequential scan per key (a
  * session-gap variant of that flavor lives in the sessionize op).
  *
  * Determinism: the per-key order is (timestamp, id) — a strict total
  * order, so `lag` is reproducible across partitionings — and the keep
  * bit is integer microsecond arithmetic.
  *
  * Scale shape: one window pass partitioned by the key columns. Hot
  * keys floor a partition on one task, the known window trade-off: at
  * crawl scale a two-phase variant (per-partition lag + boundary-row
  * exchange) removes the per-key sort; here keys are (user, type) —
  * naturally high-cardinality — so the window IS the right plan.
  */
object Debounce {

  /** @param keyCols     the identity key (duplicates must share it)
    * @param tsCol       event-time column (cast to timestamp)
    * @param idCol       unique tie-break column
    * @param windowMicros debounce window in microseconds (gap must
    *                     EXCEED it to keep)
    * @return input columns + gap_us (microseconds since the previous
    *         same-key event; null for the first) + keep.
    */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, windowMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(windowMicros >= 0L, s"need windowMicros >= 0, got $windowMicros")
    require(!events.columns.contains("__us"),
      "input already has a __us column")
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__us").asc, col(idCol).asc)
    events.withColumn("__us", us)
      .withColumn("gap_us", col("__us") - lag(col("__us"), 1).over(w))
      .withColumn("keep",
        col("gap_us").isNull || col("gap_us") > windowMicros)
      .drop("__us")
  }
}
