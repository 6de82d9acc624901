package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1767225600000L + m * 60000L)

  test("matrix equals the hand-computed transition counts and permille") {
    // u1: a -> b -> a -> a   (a->b, b->a, a->a)
    // u2: a -> b             (a->b)
    // u3: c                  (no transition — single event)
    val events = Seq(
      (1L, ts(0), "a", 10L), (1L, ts(1), "b", 11L),
      (1L, ts(2), "a", 12L), (1L, ts(3), "a", 13L),
      (2L, ts(0), "a", 20L), (2L, ts(5), "b", 21L),
      (3L, ts(0), "c", 30L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Transitions.matrix(events)
      .as[(String, String, Long, Long)].collect().toSet
    // from a: a->b twice, a->a once (row total 3); from b: b->a once
    val expect = Set(
      ("a", "b", 2L, 666L), // 2000 div 3
      ("a", "a", 1L, 333L),
      ("b", "a", 1L, 1000L))
    assert(got == expect)
    // partitioning invariance
    val got2 = Transitions.matrix(events.repartition(7))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got2 == got)
  }

  test("timestamp ties break on the tie column, not partition order") {
    // both orders of ingestion must yield the same transition: at equal
    // ts, event_id orders x before y
    val a = Seq((1L, ts(0), "x", 1L), (1L, ts(0), "y", 2L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val b = a.orderBy($"event_id".desc)
    val ga = Transitions.matrix(a).as[(String, String, Long, Long)]
      .collect().toSet
    val gb = Transitions.matrix(b.repartition(3))
      .as[(String, String, Long, Long)].collect().toSet
    assert(ga == Set(("x", "y", 1L, 1000L)))
    assert(gb == ga)
  }

  test("per-source permille rows sum to at most 1000 and cover all mass") {
    val events = Seq.tabulate(100) { i =>
      (i % 7L, ts(i), s"t${i % 4}", i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val rows = Transitions.matrix(events)
      .as[(String, String, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val total = rs.map(_._3).sum
      // floor-division: sum of permilles is within (rows) of 1000
      val pmSum = rs.map(_._4).sum
      assert(pmSum <= 1000 && pmSum > 1000 - rs.length,
        s"permille mass $pmSum outside (${1000 - rs.length}, 1000]")
      // each permille is exactly n*1000 div total
      rs.foreach { r => assert(r._4 == r._3 * 1000 / total) }
    }
  }
}
