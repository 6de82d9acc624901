package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  // period = 1 hour for readable buckets; base is exactly on a boundary
  private val P = 3600L
  private def ts(hour: Double) =
    new Timestamp(1767225600000L + (hour * 3600000L).toLong)

  test("cohorts equals a hand-computed retention triangle") {
    // u1 first in hour 0, active hours 0,1,3 (offset 0,1,3)
    // u2 first in hour 0 (two events same bucket — one distinct user),
    //    active hour 2 (offset 2)
    // u3 first in hour 1, active hours 1,2 (offsets 0,1)
    val events = Seq(
      (1L, ts(0.2)), (1L, ts(1.5)), (1L, ts(3.9)),
      (2L, ts(0.0)), (2L, ts(0.9)), (2L, ts(2.1)),
      (3L, ts(1.1)), (3L, ts(2.8))
    ).toDF("user_id", "ts")
    val base = 1767225600L / P
    val got = Retention.cohorts(events, periodSeconds = P)
      .as[(Long, Long, Long)].collect().toSet
    val expect = Set(
      (base, 0L, 2L),      // u1 + u2 in their cohort hour
      (base, 1L, 1L),      // u1
      (base, 2L, 1L),      // u2
      (base, 3L, 1L),      // u1
      (base + 1, 0L, 1L),  // u3
      (base + 1, 1L, 1L))  // u3
    assert(got == expect)
    // offset-0 cells always hold the full cohort
    val byCohort = got.groupBy(_._1)
    byCohort.foreach { case (_, cells) =>
      assert(cells.exists(_._2 == 0L), "offset 0 must exist per cohort")
    }
    // partitioning invariance
    val got2 = Retention.cohorts(events.repartition(5), periodSeconds = P)
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == got)
    intercept[IllegalArgumentException] {
      Retention.cohorts(events, periodSeconds = 0L)
    }
  }
}
