package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1767225600000L + s * 1000L)

  private def run(df: org.apache.spark.sql.DataFrame) =
    Attribution.lastTouch(df, conversionType = "purchase",
      touchTypes = Seq("click", "view"), windowSeconds = 100L)
      .as[(Long, Long, Long, String, Long)].collect().toSet

  test("credits the most recent strictly-earlier touch within the window") {
    val events = Seq(
      // u1: view@0, click@50, purchase@60 -> click (gap 10)
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(50)),
      (3L, 1L, "purchase", ts(60)),
      // u2: click@0, purchase@150 -> gap 150 > 100 -> direct
      (4L, 2L, "click", ts(0)), (5L, 2L, "purchase", ts(150)),
      // u3: purchase with no touch at all -> direct
      (6L, 3L, "purchase", ts(10)),
      // u4: touch at gap == window exactly -> attributed (<=)
      (7L, 4L, "view", ts(0)), (8L, 4L, "purchase", ts(100)),
      // noise: another user's touch must never attribute
      (9L, 5L, "click", ts(59))
    ).toDF("event_id", "user_id", "event_type", "ts")
    assert(run(events) == Set(
      (3L, 1L, 2L, "click", 10L),
      (5L, 2L, -1L, "direct", -1L),
      (6L, 3L, -1L, "direct", -1L),
      (8L, 4L, 7L, "view", 100L)))
  }

  test("equal-timestamp touch never attributes (strictly-before)") {
    // the only touch shares the conversion's exact timestamp -> direct;
    // an earlier in-window touch must win over an equal-ts one
    val events = Seq(
      (1L, 1L, "click", ts(30)), (2L, 1L, "purchase", ts(30)),
      (3L, 2L, "view", ts(10)), (4L, 2L, "click", ts(40)),
      (5L, 2L, "purchase", ts(40))
    ).toDF("event_id", "user_id", "event_type", "ts")
    assert(run(events) == Set(
      (2L, 1L, -1L, "direct", -1L),
      (5L, 2L, 3L, "view", 30L)))
  }

  test("exact-timestamp touch ties break on the larger event_id") {
    val events = Seq(
      (10L, 1L, "view", ts(5)), (11L, 1L, "click", ts(5)),
      (12L, 1L, "purchase", ts(9))
    ).toDF("event_id", "user_id", "event_type", "ts")
    assert(run(events) == Set((12L, 1L, 11L, "click", 4L)))
    // ingestion order / partitioning must not change the winner
    val shuffled = events.orderBy($"event_id".desc).repartition(5)
    assert(run(shuffled) == Set((12L, 1L, 11L, "click", 4L)))
  }

  test("matches a brute-force per-conversion argmax on random data") {
    val rnd = new scala.util.Random(7)
    val types = Array("click", "view", "purchase", "error")
    val rows = Seq.tabulate(600) { i =>
      (i.toLong, rnd.nextInt(12).toLong, types(rnd.nextInt(types.length)),
        ts(rnd.nextInt(500).toLong))
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "ts")
    val got = run(events)
    val touches = rows.filter(r => r._3 == "click" || r._3 == "view")
    val expect = rows.filter(_._3 == "purchase").map { c =>
      val cUs = c._4.getTime * 1000L
      val cands = touches.filter(t => t._2 == c._2 &&
        t._4.getTime * 1000L < cUs &&
        cUs - t._4.getTime * 1000L <= 100L * 1000000L)
      if (cands.isEmpty) (c._1, c._2, -1L, "direct", -1L)
      else {
        val best = cands.maxBy(t => (t._4.getTime * 1000L, t._1))
        (c._1, c._2, best._1, best._3,
          (cUs - best._4.getTime * 1000L) / 1000000L)
      }
    }.toSet
    assert(got == expect)
  }

  test("rejects a conversion type that is also a touch type") {
    val df = Seq((1L, 1L, "click", ts(0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Attribution.lastTouch(df, conversionType = "click")
    }
  }
}
