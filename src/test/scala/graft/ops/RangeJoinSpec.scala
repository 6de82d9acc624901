package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(n: Int, seed: Long, span: Long): Seq[Long] = {
    var state = seed
    (0 until n).map { _ =>
      state = state * 6364136223846793005L + 1442695040888963407L
      math.floorMod(state, span)
    }
  }

  test("equals brute force, each qualifying pair exactly once, " +
      "half-open boundaries honored") {
    val keys = Seq("a", "b", "c")
    val ivs = seeded(40, 5L, 10000L).zipWithIndex.map { case (lo, i) =>
      (s"iv$i", keys(i % 3), lo, lo + 1 + math.floorMod(lo * 31L, 700L))
    }
    val pts = seeded(300, 9L, 11000L).zipWithIndex.map { case (ts, i) =>
      (s"p$i", keys(i % 3), ts)
    }
    val got = RangeJoin.intervalJoin(
      ivs.toDF("iv_id", "key", "lo", "hi"),
      pts.toDF("p_id", "key", "ts"), binWidth = 100L)
      .select("iv_id", "p_id").as[(String, String)].collect().toSeq
    val brute = for {
      (ivId, k, lo, hi) <- ivs
      (pId, pk, ts) <- pts
      if pk == k && ts >= lo && ts < hi
    } yield (ivId, pId)
    assert(got.sorted == brute.sorted) // Seq compare: duplicates would fail
    assert(got.size == got.toSet.size, "pairs must be exactly-once")
  }

  test("boundary cases: ts == lo joins, ts == hi does not; bin-aligned " +
      "and negative epochs floor-div correctly") {
    val ivs = Seq(("i1", "k", -250L, 100L), ("i2", "k", 100L, 200L))
      .toDF("iv_id", "key", "lo", "hi")
    val pts = Seq(("at_lo", "k", -250L), ("mid_neg", "k", -1L),
      ("at_i1_hi", "k", 100L), ("just_below_hi", "k", 199L),
      ("at_i2_hi", "k", 200L)).toDF("p_id", "key", "ts")
    val got = RangeJoin.intervalJoin(ivs, pts, binWidth = 100L)
      .select("iv_id", "p_id").as[(String, String)].collect().toSet
    assert(got == Set(("i1", "at_lo"), ("i1", "mid_neg"),
      ("i2", "at_i1_hi"), ("i2", "just_below_hi")))
  }

  test("fail-loud guards: empty interval, over-long interval, reserved " +
      "column, colliding names") {
    val pts = Seq(("p", "k", 5L)).toDF("p_id", "key", "ts")
    def run(lo: Long, hi: Long, maxBins: Int = 4096) =
      RangeJoin.intervalJoin(
        Seq(("i", "k", lo, hi)).toDF("iv_id", "key", "lo", "hi"),
        pts, binWidth = 10L, maxBinsPerInterval = maxBins).count()
    def chainMessage(e: Throwable): String = {
      val sb = new StringBuilder; var t: Throwable = e
      while (t != null) { sb.append(t.getMessage).append('\n'); t = t.getCause }
      sb.toString
    }
    assert(chainMessage(intercept[Exception](run(7L, 7L)))
      .contains("empty interval"))
    assert(chainMessage(intercept[Exception](run(0L, 1000000L, maxBins = 16)))
      .contains("spans more than 16 bins"))
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(
        Seq(("i", "k", 0L, 5L, 0L)).toDF("iv_id", "key", "lo", "hi", "__bin"),
        pts, binWidth = 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(
        Seq(("p", "k", 0L, 5L)).toDF("p_id", "key", "lo", "hi"),
        pts, binWidth = 10L) // p_id collides across sides
    }
  }

  test("plans as an equi-join — never a nested loop or cartesian") {
    val ivs = seeded(200, 3L, 100000L).zipWithIndex
      .map { case (lo, i) => (i.toLong, i % 7, lo, lo + 500L) }
      .toDF("iv_id", "key", "lo", "hi").repartition(4)
    val pts = seeded(2000, 4L, 100000L).zipWithIndex
      .map { case (ts, i) => (i.toLong + 100000L, i % 7, ts) }
      .toDF("p_id", "key", "ts").repartition(4)
    val df = RangeJoin.intervalJoin(ivs, pts, binWidth = 250L)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"range join must stay equi-join:\n${p.take(1500)}")
  }
}
