package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-touch attribution: every conversion event is credited to the
  * SAME user's most recent touch event (of the configured touch types)
  * that happened strictly before it and within `windowSeconds`;
  * conversions with no qualifying touch are credited to the `direct`
  * bucket — the standard marketing/product attribution join.
  *
  * Determinism is pinned end-to-end: "most recent" is max (ts,
  * event_id) — an exact-timestamp tie between two touches breaks on the
  * larger event_id; a touch at the conversion's EXACT timestamp never
  * attributes (strictly-before semantics, enforced by frame exclusion
  * below, with conversions ordered before touches at equal ts so an
  * equal-ts touch falls outside the frame). The gap is integer
  * microseconds compared against windowSeconds × 1e6, so the window
  * boundary floors identically on every engine.
  *
  * Scale shape: ONE user-keyed window over the (touch ∪ conversion)
  * event stream — the carry-forward trick the as-of join uses: each row
  * sees `max(struct(ts, event_id, type))` over the PRECEDING touches of
  * its user (running max, O(1) state per row, never a buffered
  * partition), so there is no touches×conversions join at all. A
  * LATERAL/top-1-per-conversion formulation would be a skew-prone range
  * join; this is a single exchange plus a streaming window pass.
  *
  * @return (conv_id, user_id, touch_id, touch_type, gap_s); direct
  *         conversions carry (touch_id = -1, touch_type = 'direct',
  *         gap_s = -1).
  */
object Attribution {

  def lastTouch(events: DataFrame, conversionType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      windowSeconds: Long = 14400L): DataFrame = {
    require(windowSeconds > 0L, s"need windowSeconds > 0, got $windowSeconds")
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(conversionType),
      s"conversion type '$conversionType' cannot also be a touch type")
    val relevant = events
      .filter(col("event_type").isin(conversionType +: touchTypes: _*))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type").isin(touchTypes: _*).as("is_touch"))
    // conversions order BEFORE touches at equal (ts): with the frame
    // ending at 1 preceding, an equal-ts touch is behind the conversion
    // in frame order only if touches sorted first — so sort them last
    // to enforce strictly-before. event_id last keeps total order.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("is_touch"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lastTouchCol = max(when(col("is_touch"),
      struct(col("us"), col("event_id"), col("event_type")))).over(w)
    relevant
      .withColumn("lt", lastTouchCol)
      .filter(!col("is_touch"))
      .select(col("event_id").as("conv_id"), col("user_id"),
        when(col("lt").isNotNull &&
            col("us") - col("lt.us") <= windowSeconds * 1000000L,
          col("lt.event_id")).otherwise(lit(-1L)).as("touch_id"),
        when(col("lt").isNotNull &&
            col("us") - col("lt.us") <= windowSeconds * 1000000L,
          col("lt.event_type")).otherwise(lit("direct")).as("touch_type"),
        when(col("lt").isNotNull &&
            col("us") - col("lt.us") <= windowSeconds * 1000000L,
          // integer floor division (not double divide + cast): exact for
          // ANY gap magnitude, matching the oracle's `div` (ADVICE r5)
          expr("(us - lt.us) div 1000000L"))
          .otherwise(lit(-1L)).as("gap_s"))
  }
}
