package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TranscriptQaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1767225600000L + min * 60000L)

  // (conv, idx, role, text, ts)
  private val good = Seq(
    ("c0", 0, "user", "hi", ts(0)), ("c0", 1, "assistant", "hello", ts(1)),
    ("c0", 2, "user", "ok", ts(2)))

  private def audit1(rows: Seq[(String, Int, String, String, Timestamp)]) = {
    val df = rows.toDF("conv_id", "turn_idx", "role", "text", "ts")
    TranscriptQa.audit(df).as[(String, Long, Boolean, Boolean, Boolean,
      Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
  }

  test("audit flags each planted violation class and only it") {
    val rows = good ++ Seq(
      // c1: gap in turn_idx (0, 2)
      ("c1", 0, "user", "a", ts(0)), ("c1", 2, "assistant", "b", ts(1)),
      // c2: duplicate turn_idx with max faking contiguity (0, 1, 1)
      ("c2", 0, "user", "a", ts(0)), ("c2", 1, "assistant", "b", ts(1)),
      ("c2", 1, "assistant", "c", ts(2)),
      // c3: starts at 1
      ("c3", 1, "user", "a", ts(0)), ("c3", 2, "assistant", "b", ts(1)),
      // c4: ts goes backwards
      ("c4", 0, "user", "a", ts(5)), ("c4", 1, "assistant", "b", ts(3)),
      // c5: two consecutive user turns
      ("c5", 0, "user", "a", ts(0)), ("c5", 1, "user", "b", ts(1)),
      // c6: unknown role
      ("c6", 0, "user", "a", ts(0)), ("c6", 1, "system", "b", ts(1)),
      // c7: blank text
      ("c7", 0, "user", "  ", ts(0)), ("c7", 1, "assistant", "b", ts(1)))
    val a = audit1(rows)
    // (conv, n, startsAt0, contiguous, tsMono, alternate, known, nonempty, well)
    assert(a("c0") == (("c0", 3L, true, true, true, true, true, true, true)))
    assert(!a("c1")._4 && !a("c1")._9 && a("c1")._3 && a("c1")._5)
    assert(!a("c2")._4, "duplicate turn_idx must break contiguity")
    assert(!a("c2")._6, "the duplicated role pair also breaks alternation")
    assert(!a("c3")._3 && !a("c3")._4,
      "starting at 1 breaks both the zero start and max = n-1")
    assert(!a("c4")._5 && a("c4")._4)
    assert(!a("c5")._6 && a("c5")._5)
    assert(!a("c6")._7 && a("c6")._6)
    assert(!a("c7")._8)
    // exactly one check fails for the single-fault convs
    Seq("c4", "c5", "c7").foreach { c =>
      val r = a(c)
      val flags = Seq(r._3, r._4, r._5, r._6, r._7, r._8)
      assert(flags.count(!_) == 1, s"$c should fail exactly one check")
      assert(!r._9)
    }
  }

  test("synthesized north-rule transcripts are wellformed; the summary " +
      "counts a planted corruption") {
    val t = Synthetic.transcripts(spark, nConv = 50L, turnsPerConv = 6,
      nConcepts = 40L)
    val s = TranscriptQa.auditSummary(t).collect().head
    assert(s.getLong(0) == 50L && s.getLong(1) == 300L)
    (2 until s.length).foreach(i => assert(s.getLong(i) == 0L,
      s"synthetic transcripts must pass every check (field $i)"))
    // corrupt one conversation: drop its turn 3 — breaks contiguity,
    // and the now-adjacent turns 2 and 4 are both "user" so the role
    // alternation check trips too (one conv, two findings)
    val corrupted = t.filter(!(col("conv_id") === "conv0000000007" &&
      col("turn_idx") === 3))
    val c = TranscriptQa.auditSummary(corrupted).collect().head
    assert(c.getLong(0) == 50L && c.getLong(1) == 299L)
    assert(c.getAs[Long]("bad_contiguous") == 1L)
    assert(c.getAs[Long]("bad_roles_alternate") == 1L)
    assert(c.getAs[Long]("malformed") == 1L)
    // audit is partitioning-invariant
    val a1 = TranscriptQa.audit(corrupted).collect().toSet
    val a2 = TranscriptQa.audit(corrupted.repartition(7)).collect().toSet
    assert(a1 == a2)
  }
}
