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

  test("bestFitBins: non-straddling invariants + tight packing") {
    val docs = (1L to 200L)
      .map(i => (i, (1 to (i % 13 + 1).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.bestFitBins(docs, seqLen = 16L, parts = 2)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // every doc placed exactly once, nothing truncated (max 13 < 16)
    assert(out.map(_._2).sorted == (1L to 200L))
    assert(out.forall(!_._5))
    // per bin: fills disjoint and within capacity, offsets consistent
    out.groupBy(_._1).foreach { case (_, ds) =>
      val s = ds.sortBy(_._4)
      assert(s.head._4 == 0L)
      s.sliding(2).foreach {
        case Seq(a, b) => assert(b._4 == a._4 + a._3)
        case _ =>
      }
      assert(s.last._4 + s.last._3 <= 16L)
    }
    // BFD should pack tightly: total bins close to ceil(total/16)
    val total = out.map(_._3).sum
    val lowerBound = (total + 15) / 16
    val bins = out.map(_._1).distinct.size
    assert(bins <= lowerBound * 1.15 + 2,
      s"bins=$bins lower=$lowerBound")
    // deterministic for a fixed partition count
    val again = Packing.bestFitBins(docs, seqLen = 16L, parts = 2)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(again.toSet == out.toSet)
  }

  test("bestFitBins: oversized docs get their own truncated bin") {
    val docs = Seq(
      (1L, (1 to 20).map(j => s"w$j").mkString(" ")), // > seqLen
      (2L, (1 to 16).map(j => s"w$j").mkString(" ")), // == seqLen
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val out = Packing.bestFitBins(docs, seqLen = 16L, parts = 1)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    val byDoc = out.map(d => d._2 -> d).toMap
    assert(byDoc(1L)._5 && byDoc(1L)._4 == 0L)
    assert(!byDoc(2L)._5 && byDoc(2L)._4 == 0L)
    assert(!byDoc(3L)._5)
    // docs 1 and 2 are alone in their bins
    assert(out.filter(_._2 <= 2L).map(_._1)
      .forall(b => out.count(_._1 == b) == 1))
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
