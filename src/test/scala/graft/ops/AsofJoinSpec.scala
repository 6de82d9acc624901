package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join against hand-computed cases and a brute-force oracle:
  * for each left row the operator must attach exactly the right row a
  * per-key max-over-preceding scan selects.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest preceding right row per key, ties to greatest " +
      "tie column, equal timestamps included, missing -> nulls") {
    val left = Seq(
      (1L, "u1", 100L), // after r at 50 and 100 -> ties to id 12 at 100
      (2L, "u1", 99L),  // only r at 50 precedes
      (3L, "u1", 10L),  // nothing precedes -> nulls
      (4L, "u2", 500L)  // other key: r at 400
    ).toDF("event_id", "user", "t")
    val right = Seq(
      (10L, "u1", Option(50L), "a"),
      (11L, "u1", Option(100L), "b"),
      (12L, "u1", Option(100L), "c"), // same ts as 11: greater id wins
      (13L, "u2", Option(400L), "d"),
      (14L, "u2", Option(600L), "e"), // after left 500: never attached
      (15L, "u1", None, "z")          // null time matches NOTHING
    ).toDF("rid", "user", "t", "tag")
    val out = AsofJoin.asofJoin(left, right, Seq("user"), "t",
      payloadCols = Seq("rid", "tag", "t"), tieCol = "rid", prefix = "r_")
      .select("event_id", "r_rid", "r_tag", "r_t")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out == Set(
      (1L, 12L, "c", 100L),
      (2L, 10L, "a", 50L),
      (3L, -1L, "", -1L),
      (4L, 13L, "d", 400L)))
  }

  test("asofJoin EQUALS brute force on generated event data; one " +
      "exchange by key in the plan") {
    val ev = (0 until 2000).map { i =>
      val t = graft.text.TextHash.mix(7L, i.toLong) % 100000L
      (i.toLong, (i % 37).toString, math.abs(t),
        if (i % 3 == 0) "click" else "view")
    }.toDF("event_id", "user", "t", "kind")
    val clicks = ev.filter(col("kind") === "click")
      .select("event_id", "user", "t")
    val views = ev.filter(col("kind") === "view")
      .select(col("event_id").as("vid"), col("user"), col("t"))
    val got = AsofJoin.asofJoin(clicks, views, Seq("user"), "t",
      payloadCols = Seq("vid", "t"), tieCol = "vid", prefix = "v_")
      .select("event_id", "v_vid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val vArr = views.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = clicks.collect().map { c =>
      val (id, u, t) = (c.getLong(0), c.getString(1), c.getLong(2))
      val cand = vArr.filter(v => v._2 == u && v._3 <= t)
      id -> (if (cand.isEmpty) -1L
             else cand.maxBy(v => (v._3, v._1))._1)
    }.toMap
    assert(got == brute)
    // scale shape: the union carries ONE exchange by the key; no join
    // operator (the range semantics live in the sort + carry, not in a
    // quadratic candidate join)
    val plan = AsofJoin.asofJoin(clicks, views, Seq("user"), "t",
      payloadCols = Seq("vid"), tieCol = "vid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
