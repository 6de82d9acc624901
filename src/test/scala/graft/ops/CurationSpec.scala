package graft.ops

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // one document per funnel stage, plus the composition case: d8 is a
  // near-dup of the CONTAMINATED d5, so d8 must survive (pairs are
  // generated among stage-1..4 survivors only — a dropped doc can't pull
  // its twin down with it). Docs are ~40 tokens: Gopher's top-n-gram
  // mass rule counts single-occurrence grams, so very short documents
  // fail `repetition` trivially (one trigram already exceeds 18% of the
  // characters) — the thresholds presume real document lengths.
  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")
  private val dupText = toks("alpha", 40)
  private val mix = toks("mix", 37)
  private val corpus = Seq(
    1L -> dupText,
    2L -> dupText,
    3L -> "hi yo",
    4L -> Seq.fill(50)("spam").mkString(" "),
    5L -> s"quick brown fox $mix",
    6L -> s"${toks("num", 39)} ten",
    7L -> s"${toks("num", 39)} eleven",
    8L -> s"slick brown fox $mix"
  ).toDF("doc_id", "text")
  private val benchmark = Seq(
    100L -> s"the quick brown fox jumps over ${toks("bench", 34)}"
  ).toDF("doc_id", "text")

  private lazy val decisions = Curation.curate(corpus, benchmark,
      minWords = 5L, minStopHits = 0L, decontamK = 3, jaccardK = 3,
      jaccardThreshold = 0.5)
    .as[(Long, String)].collect().toMap

  test("scaleArms composition: crawl-scale stage-5 arm yields decisions " +
      "EQUAL to the default (not a recall trade)") {
    val scale = Curation.curate(corpus, benchmark,
        minWords = 5L, minStopHits = 0L, decontamK = 3, jaccardK = 3,
        jaccardThreshold = 0.5, scaleArms = true)
      .as[(Long, String)].collect().toMap
    assert(scale == decisions)
  }

  test("every stage fires on its crafted document, first-failing wins") {
    assert(decisions == Map(
      1L -> "kept",       // canonical of the exact-dup pair
      2L -> "exact_dup",  // same text, larger id
      3L -> "quality",    // 2 words < minWords
      4L -> "repetition", // one token repeated 10×
      5L -> "contaminated", // shares 3-gram "quick brown fox" w/ benchmark
      6L -> "kept",       // near-dup cluster representative (min id)
      7L -> "near_dup",   // jaccard 7/9 with doc 6
      8L -> "kept"        // near-dup ONLY of dropped d5 → survives
    ), decisions.toString)
  }

  test("funnel audit: telescoping docs_in/dropped/docs_out, total preserved") {
    val f = Curation.funnel(Curation.curate(corpus, benchmark,
        minWords = 5L, minStopHits = 0L, decontamK = 3, jaccardK = 3))
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(f.map(_._2).toSeq == Curation.Stages)
    assert(f.head._3 == 8L)                       // all docs enter stage 1
    f.foreach { case (_, _, in, dropped, out) => assert(in - dropped == out) }
    f.sliding(2).foreach { case Array(a, b) => assert(a._5 == b._3) }
    assert(f.last._4 == 0L && f.last._5 == 3L)    // kept drops nothing
  }

  test("decisions are exhaustive and disjoint over the corpus") {
    val out = Curation.curate(corpus, benchmark, minWords = 5L,
      minStopHits = 0L, decontamK = 3)
    assert(out.count() == 8L)
    assert(out.select("doc_id").distinct().count() == 8L)
    assert(out.as[(Long, String)].collect()
      .forall(r => Curation.Stages.contains(r._2)))
  }
}
