package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One event row on the stream (mirrors the batch events table). */
case class Ev(event_id: Long, user_id: Long, event_type: String,
    ts: java.sql.Timestamp)

/** Per-user carry-forward state: the best (max (us, event_id)) touch
  * seen so far — O(1) per user, the streaming twin of the batch
  * window's running max.
  */
case class TouchState(us: Long, eventId: Long, tpe: String)

/** One attributed conversion (same shape as the batch operator). */
case class AttributedConv(conv_id: Long, user_id: Long, touch_id: Long,
    touch_type: String, gap_s: Long)

/** Streaming ops over event streams.
  *
  * [[attributionStream]] is the streaming twin of
  * [[graft.ops.Attribution.lastTouch]]: the batch operator's user-keyed
  * running-max window becomes per-user `flatMapGroupsWithState` state
  * holding ONE touch — the carry-forward shape means streaming needs
  * exactly the state the batch window carries per row, nothing more.
  *
  * Parity contract: bit-identical to the batch operator when
  * micro-batches arrive in event-time order (within a micro-batch any
  * order works — the group sorts by the SAME (us, is_touch, event_id)
  * total order the batch frame uses, so strictly-before and the
  * equal-ts/equal-id tie-breaks match exactly). A touch arriving LATE
  * (behind an already-emitted conversion) cannot retract that emission
  * — the inherent append-mode limit, bounded by the watermark.
  *
  * Bounded state with exact semantics: a touch older than
  * `windowSeconds` can never attribute again (any later conversion's
  * gap exceeds the window), so state times out at touch-time + window
  * — expiry changes no output, it only caps state at the number of
  * users active within one window horizon.
  */
object EventStream {

  /** Full-microsecond event time: `getTime` truncates to milliseconds,
    * while the batch twin compares `unix_micros(ts)` — recover the
    * sub-millisecond component from `getNanos` so strictly-before
    * checks, (us, event_id) tie-breaks, window-boundary decisions and
    * gap_s stay bit-identical to the batch operator (ADVICE r5).
    */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType)))

  def readEventStream(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)

  def attributionStream(stream: DataFrame,
      conversionType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      windowSeconds: Long = 14400L,
      watermark: String = "2 hours"): Dataset[AttributedConv] = {
    require(windowSeconds > 0L, s"need windowSeconds > 0, got $windowSeconds")
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(conversionType),
      s"conversion type '$conversionType' cannot also be a touch type")
    val spark = stream.sparkSession
    import spark.implicits._
    val touchSet = touchTypes.toSet
    val windowMicros = windowSeconds * 1000000L
    stream.withWatermark("ts", watermark)
      .filter(col("event_type").isin(conversionType +: touchTypes: _*))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, AttributedConv](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, evs, state) =>
          if (state.hasTimedOut) {
            // the stored touch aged out of the window: no future
            // conversion can use it (see scaladoc) — dropping it here
            // changes no output
            state.remove()
            Iterator.empty
          } else {
            // the batch frame's exact total order: conversions sort
            // BEFORE touches at equal ts (false < true), event_id last
            val sorted = evs.toArray.sortBy(e =>
              (tsMicros(e.ts), touchSet(e.event_type), e.event_id))
            val out = Seq.newBuilder[AttributedConv]
            var best = state.getOption
            sorted.foreach { e =>
              val us = tsMicros(e.ts)
              if (touchSet(e.event_type)) {
                if (best.forall(b =>
                    b.us < us || (b.us == us && b.eventId < e.event_id)))
                  best = Some(TouchState(us, e.event_id, e.event_type))
              } else {
                out += (best match {
                  // us > b.us = strictly-before (an equal-ts touch from
                  // any batch never attributes, same as the batch frame)
                  case Some(b) if us > b.us && us - b.us <= windowMicros =>
                    AttributedConv(e.event_id, user, b.eventId, b.tpe,
                      (us - b.us) / 1000000L)
                  case _ =>
                    AttributedConv(e.event_id, user, -1L, "direct", -1L)
                })
              }
            }
            best.foreach { b =>
              state.update(b)
              state.setTimeoutTimestamp(math.max(
                b.us / 1000L + windowSeconds * 1000L,
                state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
  }
}
