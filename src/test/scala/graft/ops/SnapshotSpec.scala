package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged by content " +
      "fingerprint; whitespace/case churn is NOT a change") {
    val old = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta"),
      (4L, "kept exactly")).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "  Alpha   BETA "), // normalizes equal → unchanged
      (2L, "gamma delta edited"), // changed
      (4L, "kept exactly"), // unchanged
      (9L, "brand new doc")) // added; 3 removed
      .toDF("doc_id", "text")
    val got = Snapshot.diff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 9L -> "added"))
    val stats = Snapshot.diffStats(Snapshot.diff(old, neu)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
    // the shuffle carries fingerprints, not text
    val plan = Snapshot.diff(old, neu).queryExecution.executedPlan.toString
    assert(!plan.contains("text#") ||
      !plan.split("Exchange").drop(1).mkString.contains("text#"),
      "text column must be projected away before the join exchange")
  }
}
