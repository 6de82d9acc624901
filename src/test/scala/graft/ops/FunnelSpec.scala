package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("funnelCounts: strict in-order completion over a handmade stream") {
    // u1 completes all three in order; u2 has the purchase BEFORE the
    // click (counts for signup+click only); u3 signup only; u4 starts
    // at click (never enters the funnel); u5 same-timestamp click as
    // signup (strict > drops it)
    val events = Seq(
      (1L, "signup", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
      (2L, "signup", ts(0)), (2L, "purchase", ts(3)), (2L, "click", ts(4)),
      (3L, "signup", ts(2)),
      (4L, "click", ts(1)), (4L, "purchase", ts(2)),
      (5L, "signup", ts(7)), (5L, "click", ts(7))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelCounts(events,
        Seq("signup", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((1, "signup", 4L), (2, "click", 2L),
      (3, "purchase", 1L)))
    // a later u5 click (strictly after the signup) completes the step
    // the same-timestamp one couldn't — the chain takes the earliest
    // QUALIFYING event, not the earliest overall
    val more = events.union(
      Seq((5L, "click", ts(9))).toDF("user_id", "event_type", "ts"))
    val got2 = Funnel.funnelCounts(more, Seq("signup", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSet
    assert(got2 == Set((1, "signup", 4L), (2, "click", 3L),
      (3, "purchase", 1L)))
    // partitioning invariance
    val got3 = Funnel.funnelCounts(more.repartition(7),
        Seq("signup", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSet
    assert(got3 == got2)
  }

  test("funnelCounts windowed: per-hop gap expires anchors, and a LATER " +
      "qualifying anchor rescues a conversion greedy-earliest would miss") {
    val gap3min = 180000000L
    val events = Seq(
      // u1 completes all within the window
      (1L, "signup", ts(0)), (1L, "click", ts(2)), (1L, "purchase", ts(4)),
      // u2's click is 10 min after signup — expired
      (2L, "signup", ts(0)), (2L, "click", ts(10)),
      // u3: the FIRST signup (ts 0) cannot anchor the ts-10 click, the
      // second (ts 8) can — qualifying-set semantics must count it;
      // the purchase at ts 20 is 10 min after the click — expired
      (3L, "signup", ts(0)), (3L, "signup", ts(8)), (3L, "click", ts(10)),
      (3L, "purchase", ts(20))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelCounts(events, Seq("signup", "click", "purchase"),
        maxGapMicros = gap3min)
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((1, "signup", 3L), (2, "click", 2L),
      (3, "purchase", 1L)))
    // boundary: exactly at the gap is INSIDE the window (<=)
    val edge = Seq((9L, "signup", ts(0)), (9L, "click", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val e = Funnel.funnelCounts(edge, Seq("signup", "click"),
        maxGapMicros = gap3min)
      .as[(Int, String, Long)].collect().toSet
    assert(e == Set((1, "signup", 1L), (2, "click", 1L)))
  }

  test("funnelCounts: distinct-step, non-empty and gap guards") {
    val df = Seq((1L, "a", ts(0))).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Funnel.funnelCounts(df, Seq("a", "b", "a"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnelCounts(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnelCounts(df, Seq("a"), maxGapMicros = -1L)
    }
  }
}
