package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("mine equals a brute-force document-cooccurrence computation") {
    // 6 docs over a tiny vocab; "cat dog" co-occur more than chance,
    // "cat fish" less
    val docs = Seq(
      (0L, "cat dog bird"),
      (1L, "cat dog"),
      (2L, "cat dog fish"),
      (3L, "fish bird"),
      (4L, "cat bird"),
      (5L, "dog")
    ).toDF("doc_id", "text")
    val n = docs.count()
    val got = Collocations.mine(docs, topK = 10, minPairCount = 1)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet

    // brute force in Scala with identical tokenization (space-split sets)
    val sets = Seq(
      0L -> Set("cat", "dog", "bird"), 1L -> Set("cat", "dog"),
      2L -> Set("cat", "dog", "fish"), 3L -> Set("fish", "bird"),
      4L -> Set("cat", "bird"), 5L -> Set("dog"))
    val df = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val terms = df.keys.toSeq.sorted
    val expect = (for {
      i <- terms.indices; j <- (i + 1) until terms.size
      a = terms(i); b = terms(j)
      nab = sets.count { case (_, s) => s(a) && s(b) }.toLong
      if nab >= 1
    } yield (a, b, nab, df(a), df(b),
        nab * 1000L * n / (df(a) * df(b)))).toSet
    assert(got == expect)

    // spot checks: attraction vs repulsion
    val byPair = got.map(r => (r._1, r._2) -> r._6).toMap
    assert(byPair(("cat", "dog")) == 3L * 1000 * 6 / (4L * 4L)) // 1125 > 1000
    assert(byPair(("cat", "fish")) == 1L * 1000 * 6 / (4L * 2L)) // 750 < 1000
  }

  test("topK bounds the vocabulary with deterministic df/term tie-break") {
    val docs = Seq(
      (0L, "aa bb cc dd"),
      (1L, "aa bb cc"),
      (2L, "aa bb"),
      (3L, "aa zz")
    ).toDF("doc_id", "text")
    // df: aa=4, bb=3, cc=2, dd=1, zz=1 → topK=3 keeps {aa, bb, cc}
    val got = Collocations.mine(docs, topK = 3, minPairCount = 1)
      .as[(String, String, Long, Long, Long, Long)].collect()
    val seen = got.flatMap(r => Seq(r._1, r._2)).toSet
    assert(seen == Set("aa", "bb", "cc"))
    // df tie at the boundary (dd vs zz both 1) is outside K here; tie
    // WITHIN the boundary: topK=4 must pick dd (term asc) over zz
    val got4 = Collocations.mine(docs, topK = 4, minPairCount = 1)
      .as[(String, String, Long, Long, Long, Long)].collect()
    val seen4 = got4.flatMap(r => Seq(r._1, r._2)).toSet
    assert(seen4.contains("dd") && !seen4.contains("zz"))
  }

  test("minPairCount floors the edge table; repetition within doc ignored") {
    val docs = Seq(
      (0L, "x y x y x"), // repetition: still ONE co-doc for (x, y)
      (1L, "x y"),
      (2L, "x q")
    ).toDF("doc_id", "text")
    val got = Collocations.mine(docs, topK = 10, minPairCount = 2)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("x", "y")))
    assert(got.head._3 == 2L) // two docs, not five token pairs
    // partitioning invariance
    val got2 = Collocations.mine(docs.repartition(5), topK = 10,
      minPairCount = 2).as[(String, String, Long, Long, Long, Long)]
      .collect().toSet
    assert(got2 == got.toSet)
  }
}
