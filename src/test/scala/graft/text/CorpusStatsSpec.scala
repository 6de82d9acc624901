package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("tokenFreqScore: mean corpus frequency, exact integer ratios") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = CorpusStats.tokenFreqScore(docs)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // freq: a=2, b=2, c=1; doc1 = (2+2+2)/3, doc2 = (2+1)/2; blank absent
    assert(out == Seq((1L, 3L, 6L, 2.0), (2L, 2L, 3L, 1.5)))
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

  test("vocabStats: exact counts; HLL arm within 3*rsd with a " +
      "sketch-sized exchange") {
    val docs = Seq(
      (1L, "apple apple banana"), (2L, "banana  CHERRY"),
      (3L, ""), (4L, "date")).toDF("doc_id", "text")
    val exact = CorpusStats.vocabStats(docs)
      .as[(Long, Long, Long)].collect().head
    // doc 3 has no tokens → 3 token-bearing docs, 6 tokens, 4 distinct
    assert(exact == ((3L, 6L, 4L)))
    // HLL arm on a corpus big enough for the estimate to mean something
    val wide = (0 until 2000).map(i =>
      (i.toLong, s"tok$i tok${i + 1} common")).toDF("doc_id", "text")
    val ex = CorpusStats.vocabStats(wide)
      .as[(Long, Long, Long)].collect().head
    val ap = CorpusStats.vocabStats(wide, approximate = true, rsd = 0.02)
      .as[(Long, Long, Long)].collect().head
    assert(ap._2 == ex._2) // the plain count stays exact
    for ((got, want) <- Seq((ap._1, ex._1), (ap._3, ex._3))) {
      val relErr = math.abs(got - want).toDouble / want
      assert(relErr < 0.06, s"HLL err $relErr (exact $want, got $got)")
    }
    // the sketch arm must not shuffle tokens: no Expand (the exact
    // mixed-distinct plan's marker) anywhere in its plan
    val apPlan = CorpusStats.vocabStats(wide, approximate = true)
      .queryExecution.executedPlan.toString
    assert(!apPlan.contains("Expand"), s"sketch arm expanded:\n$apPlan")
    val exPlan = CorpusStats.vocabStats(wide)
      .queryExecution.executedPlan.toString
    assert(exPlan.contains("Expand"), "exact-arm plan shape changed — " +
      "re-check the scaladoc's cost story")
  }

  test("sourceStats: per-source dup rate from distinct fingerprints; " +
      "HLL arm agrees at small cardinality") {
    val docs = Seq(
      (1L, "same text", "web"), (2L, "Same   TEXT", "web"), // one fp
      (3L, "other text", "web"),
      (4L, "unique here", "books"), (5L, "and another", "books")
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceStats(docs)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("web") == (("web", 3L, 6L, 2L, 1.0 - 2.0 / 3)))
    assert(out("books") == (("books", 2L, 4L, 2L, 0.0)))
    // HLL at tiny cardinality is exact (dense register path)
    val ap = CorpusStats.sourceStats(docs, approximate = true)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(ap == Map("web" -> 2L, "books" -> 2L))
  }

  test("lengthQuantiles: rank-ceil(q*n) definition, hand-computed; " +
      "sketch arm within rank-error bound of the exact arm") {
    // source s1: token counts 1..10 (doc_id = token count)
    val docs = (1 to 10).map(i =>
      (i.toLong, (1 to i).map(_ => "w").mkString(" "), "s1")) ++
      Seq((100L, "a b c", "s2")) // single-doc source: every q hits it
    val df = docs.toDF("doc_id", "text", "source")
    val out = CorpusStats.lengthQuantiles(df, qs = Seq(0.25, 0.5, 1.0))
      .as[(String, Double, Long, Long)].collect().toSet
    // s1 n=10: ceil(2.5)=rank 3 → 3 tokens; ceil(5)=rank 5 → 5; rank 10 → 10
    assert(out == Set(("s1", 0.25, 10L, 3L), ("s1", 0.5, 10L, 5L),
      ("s1", 1.0, 10L, 10L), ("s2", 0.25, 1L, 3L), ("s2", 0.5, 1L, 3L),
      ("s2", 1.0, 1L, 3L)))
    // sketch arm: same schema, tokens_at_q within the quantile band
    // implied by percentile_approx's rank error (generous: exact range)
    val big = (0 until 500).map(i =>
      (i.toLong, (0 to i % 50).map(_ => "w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val exact = CorpusStats.lengthQuantiles(big)
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    val approx = CorpusStats.lengthQuantiles(big, approximate = true)
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    assert(approx.keySet == exact.keySet)
    // uniform 1..50 distribution: allow ±2 token-count slack at
    // accuracy 10000 over 500 rows (rank error < n/accuracy = 0.05 rows;
    // value slack covers duplicate-value plateaus)
    exact.foreach { case (q, v) =>
      assert(math.abs(approx(q) - v) <= 2L,
        s"q=$q: approx ${approx(q)} vs exact $v")
    }
  }

  test("keywordSearch: integer-scaled tf*idf sum, hand-computed; " +
      "map-side filter before shuffle; top-k order deterministic") {
    val docs = Seq(
      (1L, "spark merge spark"),      // tf(spark)=2, tf(merge)=1
      (2L, "merge customer"),         // tf(merge)=1, tf(customer)=1
      (3L, "spark"),                  // tf(spark)=1
      (4L, "other words only")        // no match — absent
    ).toDF("doc_id", "text")
    // N=4; df: spark=2, merge=2, customer=1; scale=100 →
    // w(spark)=floor(400/2)=200, w(merge)=200, w(customer)=400
    val out = CorpusStats.keywordSearch(docs, "spark merge customer",
      topK = 10, scale = 100L)
      .as[(Long, Long, Long)].collect().toSeq
    // scores: doc1 = 2*200+1*200 = 600; doc2 = 200+400 = 600; doc3 = 200
    // tie at 600 breaks on doc_id asc
    assert(out == Seq((1L, 2L, 600L), (2L, 2L, 600L), (3L, 1L, 200L)))
    // the isin filter must sit under the explode-side projection, before
    // any exchange: no full-token shuffle in the plan
    val plan = CorpusStats.keywordSearch(docs, "spark", topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be a heap merge, not a sort:\n${plan.take(1200)}")
  }

  test("bigramLmScore: hand-computed integer conditionals; short docs " +
      "score zero") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    // unigrams: a=3, b=3, x=1; bigrams: (a,b)=3, (b,a)=1
    // cond(a→b) = 10^6*3 div 3 = 1000000; cond(b→a) = 10^6 div 3 = 333333
    val out = CorpusStats.bigramLmScore(docs)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 2333333L, 2333333.0 / 3.0),
      (2L, 1L, 1000000L, 1000000.0),
      (3L, 0L, 0L, 0.0)))
  }

  test("lengthOutlierTrim: integer band on (length, doc_id) ranks; " +
      "nulls rank as length 0") {
    // src a: lengths 1..10 → with lo=200‰, hi=800‰ keep ranks where
    // (rn-1)*1000 in [200*9, 800*9] → rn in [2.8, 8.2] → ranks 3..8
    val docs = (1L to 10L).map(i => (i, "a", "x" * i.toInt)) :+
      ((11L, "b", null.asInstanceOf[String])) :+ ((12L, "b", "yy"))
    val out = CorpusStats.lengthOutlierTrim(
      docs.toDF("doc_id", "source", "text"), 200, 800)
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1).toSeq
    assert(out.filter(_._2 == "a").map(r => (r._1, r._6)) ==
      (1L to 10L).map(i => (i, i >= 3 && i <= 8)))
    // src b: n=2 → band is (rn-1)*1000 in [200, 800] → neither rank 1
    // (0) nor rank 2 (1000) survives; null text ranks first at length 0
    assert(out.filter(_._2 == "b") == Seq(
      (11L, "b", 0L, 1L, 2L, false), (12L, "b", 2L, 2L, 2L, false)))
  }

  test("lengthOutlierTrim: degenerate band keeps a single-doc source") {
    // n_src=1 → both sides are 0 >= 0 and 0 <= 0: kept for any band
    val docs = Seq((1L, "solo", "abc")).toDF("doc_id", "source", "text")
    val out = CorpusStats.lengthOutlierTrim(docs, 20, 980)
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, "solo", 3L, 1L, 1L, true)))
  }

  test("cmsHeavyHitters: estimate >= exact frequency (one-sided CMS " +
      "guarantee), heavy terms recalled, sketch state bounded") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val est = CorpusStats.cmsHeavyHitters(docs, depth = 4, width = 4096,
      minFreq = 1L).as[(String, Long)].collect().toMap
    val exact = docs
      .select(explode(filter(split(lower(trim($"text")), "\\s+"),
        t => length(t) > 0)).as("term"))
      .groupBy("term").count().as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    // one-sided: CMS never undercounts
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"undercount for '$t': ${est(t)} < $n") }
    // overestimate bound: expected collision mass per row is N/width;
    // the min over 4 independent rows sits well under a few multiples
    val nTok = exact.values.sum
    val worst = exact.map { case (t, n) => est(t) - n }.max
    assert(worst <= math.max(8L * nTok / 4096, 8L),
      s"overestimate $worst exceeds the sketch error budget")
    // recall at a threshold: every term with exact >= 32 must clear
    // minFreq=32 in the sketch (est >= exact makes this structural)
    val heavy = exact.filter(_._2 >= 32L).keySet
    val selected = CorpusStats.cmsHeavyHitters(docs, depth = 4,
      width = 4096, minFreq = 32L).as[(String, Long)].collect().map(_._1).toSet
    assert(heavy.subsetOf(selected))
  }
}
