package graft.text

import graft.SparkSpec

/** Concat-and-chunk sequence packing: hand-computed placements, boundary
  * straddles, blank-document exclusion, and partition-count invariance
  * (the distributed prefix sum must give the same global offsets at any
  * parallelism).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def place(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted

  test("hand-computed placements with a straddling document") {
    val docs = Seq(
      (1L, "t1 t2 t3"),             // nt=3, cstart 0
      (2L, "u1 u2 u3 u4"),          // nt=4, cstart 3 → straddles seq 0/1
      (3L, "   "),                  // blank → excluded
      (4L, "v1 v2 v3 v4 v5")        // nt=5, cstart 7 → straddles seq 1/2
    ).toDF("doc_id", "text")
    val out = place(Packing.concatChunk(docs, seqLen = 4L))
    assert(out == Seq(
      (0L, 1L, 0L, 0L, 3L),
      (0L, 2L, 0L, 3L, 1L),
      (1L, 2L, 1L, 0L, 3L),
      (1L, 4L, 0L, 3L, 1L),
      (2L, 4L, 1L, 0L, 4L)))
    // invariants: each sequence except the last is exactly full, and each
    // document's slices cover it exactly once
    val bySeq = out.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    assert(bySeq == Map(0L -> 4L, 1L -> 4L, 2L -> 4L))
    val byDoc = out.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(byDoc == Map(1L -> 3L, 2L -> 4L, 4L -> 5L))
  }

  test("materializeSequences: assembled token streams in global order") {
    val docs = Seq(
      (1L, "t1 t2 t3"),
      (2L, "u1 u2 u3 u4"),
      (4L, "v1 v2 v3 v4 v5")
    ).toDF("doc_id", "text")
    val seqs = Packing.materializeSequences(docs, seqLen = 4L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(seqs == Seq(
      (0L, "t1 t2 t3 u1", 2L, 4L),
      (1L, "u2 u3 u4 v1", 2L, 4L),
      (2L, "v2 v3 v4 v5", 1L, 4L)))
  }

  test("partition-count invariance of the distributed prefix sum") {
    val docs = (1L to 97L)
      .map(i => (i, (1 to (i % 7 + 1).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val one = place(Packing.concatChunk(docs, seqLen = 16L, parts = 1))
    val many = place(Packing.concatChunk(docs, seqLen = 16L, parts = 13))
    assert(one == many)
    // total placed tokens = total corpus tokens
    val total = (1L to 97L).map(i => i % 7 + 1).sum
    assert(one.map(_._5).sum == total)
    // doc_offset slices within each doc are contiguous from 0
    one.groupBy(_._2).foreach { case (_, slices) =>
      val s = slices.sortBy(_._3)
      assert(s.head._3 == 0L)
      s.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 == a._3 + a._5)
        case _ =>
      }
    }
  }
}
