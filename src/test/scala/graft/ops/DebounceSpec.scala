package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Debounce dedup against a handmade retry storm: lag-1 semantics
  * (previous RAW event, not previous kept), strict (ts, id) order, and
  * partitioning independence.
  */
class DebounceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("debounce: keep bits match the lag-1 definition exactly") {
    // user u, type click at t = 0, 30, 45, 200: lag gaps null/30/15/155.
    // 60 s window → keeps: first (null), 200 (155 > 60). NOTE 45 is
    // dropped even though 30 was also dropped — lag-1, not kept-chain.
    // A second key (u, view) is untouched by u's clicks.
    val events = Seq(
      (1L, "u", "click", ts(0)), (2L, "u", "click", ts(30)),
      (3L, "u", "click", ts(45)), (4L, "u", "click", ts(200)),
      (5L, "u", "view", ts(31)), (6L, "v", "click", ts(32))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Debounce.debounce(events, Seq("user_id", "event_type"),
      "ts", "event_id", windowMicros = 60000000L)
      .select("event_id", "gap_us", "keep")
      .as[(Long, Option[Long], Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, None, true), (2L, Some(30000000L), false),
      (3L, Some(15000000L), false), (4L, Some(155000000L), true),
      (5L, None, true), (6L, None, true)))
  }

  test("debounce: equal timestamps break on id; zero window keeps all " +
      "strictly-later events; result is partitioning-independent") {
    val events = Seq(
      (10L, "u", "x", ts(100)), (11L, "u", "x", ts(100)),
      (12L, "u", "x", ts(101))
    ).toDF("event_id", "user_id", "event_type", "ts")
    // window 0: gap must EXCEED 0 → the same-second duplicate (gap 0)
    // drops, the next second (gap 1s) keeps
    val out = Debounce.debounce(events, Seq("user_id", "event_type"),
      "ts", "event_id", windowMicros = 0L)
      .select("event_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out == Map(10L -> true, 11L -> false, 12L -> true))
    val rep = Debounce.debounce(events.repartition(5),
      Seq("user_id", "event_type"), "ts", "event_id", 0L)
      .select("event_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(rep == out)
  }
}
