package graft.text

import graft.SparkSpec

/** Corpus-statistics operators against hand-computed fixtures: exact
  * n-gram counts with deterministic tie-breaks, and the linear-idf
  * TF-IDF ranking (score = tf · N / df — exact integer-ratio doubles).
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("topNgrams: exact positional counts, deterministic tie order") {
    val docs = Seq(
      (1L, "a b c a b c"), // 3-grams: "a b c", "b c a", "c a b", "a b c"
      (2L, "a b c"),       // one span: "a b c"
      (3L, "x y")          // under k tokens: contributes none
    ).toDF("doc_id", "text")
    val top = CorpusStats.topNgrams(docs, k = 3, topN = 2)
      .as[(String, Long)].collect().toSeq
    // "a b c" occurs 3×; the count-1 tie breaks lexicographically
    assert(top == Seq(("a b c", 3L), ("b c a", 1L)))
  }

  test("tfidf: score = tf*N/df, ties break on term, rank per doc") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")
    ).toDF("doc_id", "text")
    // N = 3; df: apple 1, banana 2, cherry 2, date 1
    val out = CorpusStats.tfidfTopTerms(docs, topPerDoc = 3)
      .as[(Long, String, Long, Double, Long)].collect().toSet
    assert(out == Set(
      (1L, "apple", 2L, 6.0, 1L), (1L, "banana", 1L, 1.5, 2L),
      // doc 2: banana and cherry tie at 1.5 — term asc breaks it
      (2L, "banana", 1L, 1.5, 1L), (2L, "cherry", 1L, 1.5, 2L),
      (3L, "cherry", 3L, 4.5, 1L), (3L, "date", 1L, 3.0, 2L)))
  }

  test("tfidf: topPerDoc truncates the per-document ranking") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // all five terms score 1*1/1 = 1.0; term asc picks a, b
    val out = CorpusStats.tfidfTopTerms(docs, topPerDoc = 2)
      .as[(Long, String, Long, Double, Long)].collect().toSet
    assert(out == Set((1L, "a", 1L, 1.0, 1L), (1L, "b", 1L, 1.0, 2L)))
  }
}
