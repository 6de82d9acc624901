package graft.text

import graft.SparkSpec

/** Intra-document repetition metrics (the Gopher repetition-filter
  * family) against hand-computed fixtures: top-n-gram character mass and
  * duplicate-n-gram position coverage, both exact integer ratios.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: top-n-gram character-mass fraction") {
    // tokens = [a,b,a,b,a,b], chars = 6 + 5 = 11
    // 2-grams: "a b"×3 (mass 9), "b a"×2 (mass 6) → top2 = 9/11
    // 3-grams: "a b a"×2 (mass 10), "b a b"×2 (mass 10) → top3 = 10/11
    val (nT, nC, top, dup) =
      TextHash.repetitionStats("a b a b a b", Array(2, 3), Array(5, 6))
    assert(nT == 6 && nC == 11L)
    assert(top.toSeq == Seq(9.0 / 11, 10.0 / 11))
    // 5-grams "a b a b a" / "b a b a b" occur once each → dup5 = 0;
    // the single 6-gram occurs once → dup6 = 0
    assert(dup.toSeq == Seq(0.0, 0.0))
  }

  test("kernel: duplicate-n-gram position coverage is an interval union") {
    // 10 tokens; the 5-gram "x y z w v" occurs at positions 0 and 5 →
    // every position is covered exactly once → dup5 = 1.0
    val (nT, _, _, dup) =
      TextHash.repetitionStats("x y z w v x y z w v", Array(2), Array(5))
    assert(nT == 10 && dup.toSeq == Seq(1.0))
    // overlapping occurrences of "a a" cover positions 0..3 of 6 → 4/6
    val (_, _, _, dup2) =
      TextHash.repetitionStats("a a a a b c", Array(2), Array(2))
    assert(dup2.toSeq == Seq(4.0 / 6))
  }

  test("kernel: documents shorter than n score 0.0; empty text is safe") {
    val (nT, nC, top, dup) =
      TextHash.repetitionStats("one two", Array(3), Array(5))
    assert(nT == 2 && nC == 7L)
    assert(top.toSeq == Seq(0.0) && dup.toSeq == Seq(0.0))
    val (n0, c0, t0, d0) = TextHash.repetitionStats("  ", Array(2), Array(5))
    assert(n0 == 0 && c0 == 0L && t0.toSeq == Seq(0.0) && d0.toSeq == Seq(0.0))
  }

  test("repetitionMetrics: schema, values, and Gopher keep decision") {
    // doc 1: 30 distinct tokens — all n-gram counts are 1, so top-n mass
    // is just the longest gram's length over ~110 chars, under every
    // Gopher bound (short natural sentences trip the bounds: count-1
    // grams over few chars — the filter is calibrated for web documents)
    val docs = Seq(
      (1L, (1 to 30).map(i => s"a$i").mkString(" ")),
      (2L, "spam spam spam spam spam spam spam spam spam spam"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionMetrics(docs)
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "n_chars",
      "top2_frac", "top3_frac", "top4_frac", "dup5_frac", "dup6_frac",
      "dup7_frac", "dup8_frac", "dup9_frac", "dup10_frac", "keep"))
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    // doc 2: tokens 10× "spam", chars = 40 + 9 = 49; "spam spam" count 9,
    // mass 9*9 = 81 > 49 → top2 capped... no cap: 81/49 > 0.2 → drop;
    // every 5-gram occurs 6× → dup5 = 1.0 → drop on both families
    val d2 = rows(2L)
    assert(d2.getDouble(3) == 81.0 / 49)
    assert(d2.getDouble(6) == 1.0 && !d2.getBoolean(12))
    // doc 3: 20 tokens, the 10-gram block repeats → dup10 = 1.0 → drop,
    // but top2 mass: each 2-gram "wI wI+1" occurs 2× except "w10 w1" 1×;
    // best mass = 2 * len("w9 w10") = 2*6
    val d3 = rows(3L)
    val chars3 = d3.getLong(2)
    assert(d3.getDouble(3) == 12.0 / chars3)
    assert(d3.getDouble(11) == 1.0 && !d3.getBoolean(12))
    // doc 1: mild repetition only → keep
    assert(rows(1L).getBoolean(12))
  }
}
