package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 10000L).toDF("doc_id")

  test("assignSplit: disjoint, exhaustive, and within binomial bounds") {
    val out = Sampling.assignSplit(ids, trainPct = 80, valPct = 10)
    assert(out.count() == 10000)
    val bySplit = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit.values.sum == 10000)
    // 5-sigma binomial bounds on 10000 deterministic-hash draws
    assert(math.abs(bySplit("train") - 8000) < 200, bySplit.toString)
    assert(math.abs(bySplit("val") - 1000) < 150, bySplit.toString)
    assert(math.abs(bySplit("test") - 1000) < 150, bySplit.toString)
    // buckets live in [0, 100) and match the split bands exactly
    val bad = out.filter(
      (col("bucket") < 0) || (col("bucket") >= 100) ||
      (col("split") === "train" && col("bucket") >= 80) ||
      (col("split") === "val" &&
        (col("bucket") < 80 || col("bucket") >= 90)) ||
      (col("split") === "test" && col("bucket") < 90)).count()
    assert(bad == 0)
  }

  test("assignSplit is stable under corpus growth and partitioning; " +
      "salt re-deals") {
    val subset = Sampling.assignSplit(ids.filter(col("doc_id") < 1000))
      .as[(Long, Long, String)].collect()
      .map { case (id, b, s) => id -> ((b, s)) }.toMap
    val superset = Sampling.assignSplit(ids.repartition(13))
      .filter(col("doc_id") < 1000)
      .as[(Long, Long, String)].collect()
      .map { case (id, b, s) => id -> ((b, s)) }.toMap
    assert(subset == superset,
      "adding documents or repartitioning moved an existing split")
    val reDealt = Sampling.assignSplit(ids.filter(col("doc_id") < 1000),
      salt = "v2").as[(Long, Long, String)].collect()
      .count { case (id, _, s) => subset(id)._2 != s }
    assert(reDealt > 50, s"salt change re-dealt only $reDealt of 1000")
  }

  test("hashSample: deterministic kept set at ~fraction, consistent with " +
      "bucket granularity") {
    val kept = Sampling.hashSample(ids, 0.1).as[Long].collect().toSet
    assert(math.abs(kept.size - 1000) < 150, kept.size.toString)
    val again = Sampling.hashSample(ids.repartition(7), 0.1)
      .as[Long].collect().toSet
    assert(kept == again, "kept set depends on partitioning")
    // nested samples: a 5% sample is a subset of the 10% sample (threshold
    // monotonicity — the property that makes downsampling ladders coherent)
    val five = Sampling.hashSample(ids, 0.05).as[Long].collect().toSet
    assert(five.subsetOf(kept))
    // fraction 0 and 1 are exact
    assert(Sampling.hashSample(ids, 0.0).count() == 0)
    assert(Sampling.hashSample(ids, 1.0).count() == 10000)
  }

  test("importanceSample: keep rate tracks the weight, monotone in the " +
      "weight, weight 0/1 exact, agrees with hashSample at constant w") {
    val weighted = ids.withColumn("w",
      (col("doc_id") % 100).cast("double") / 100.0)
    val kept = Sampling.importanceSample(weighted, col("w"))
      .as[(Long, Double)].collect().map(_._1).toSet
    // E[kept] = 10000 * mean(w) = 4950
    assert(math.abs(kept.size - 4950) < 300, kept.size.toString)
    // monotone: kept at w stays kept when every weight grows
    val grown = Sampling.importanceSample(
        weighted.withColumn("w", least(col("w") * 1.5, lit(1.0))), col("w"))
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(kept.subsetOf(grown))
    // weight 0 drops everything, weight 1 keeps everything (clamped)
    assert(Sampling.importanceSample(weighted, lit(0.0)).count() == 0)
    assert(Sampling.importanceSample(weighted, lit(2.0)).count() == 10000)
    // constant weight = hashSample at that fraction (same hash point)
    val const = Sampling.importanceSample(weighted, lit(0.1))
      .as[(Long, Double)].collect().map(_._1).toSet
    val hs = Sampling.hashSample(ids, 0.1).as[Long].collect().toSet
    assert(const == hs)
  }

  test("capPerSource: cap respected, under-cap sources untouched, " +
      "nested in the cap, selection = per-source hash order") {
    // src0: 40 docs (over cap), src1: 5 docs (under cap)
    val docs = ((0L until 40L).map(i => (i, "src0")) ++
      (100L until 105L).map(i => (i, "src1"))).toDF("doc_id", "source")
    val kept10 = Sampling.capPerSource(docs, cap = 10)
      .as[(Long, String)].collect()
    val by = kept10.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(by("src0").size == 10)
    assert(by("src1") == (100L until 105L).toSet) // untouched, no resample
    // selection = the 10 lowest (hash, id) of src0 — recompute brutely
    val hashed = docs.filter(col("source") === "src0")
      .select(col("doc_id"), Sampling.bucketHash(col("doc_id"), "v1"))
      .as[(Long, Long)].collect()
    val expect = hashed.sortBy { case (id, h) => (h, id) }
      .take(10).map(_._1).toSet
    assert(by("src0") == expect)
    // nested: cap 10 kept-set ⊆ cap 20 kept-set
    val kept20 = Sampling.capPerSource(docs, cap = 20)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(kept10.map(_._1).toSet.subsetOf(kept20))
    // schema passthrough: same columns as the input
    assert(Sampling.capPerSource(docs, 10).columns.toSeq ==
      Seq("doc_id", "source"))
  }

  test("stratifiedSample: per-stratum fractions, nested and independent") {
    val docs = (0L until 9000L)
      .map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    def keptSet(fr: Map[String, Double]) =
      Sampling.stratifiedSample(docs, fr, defaultFraction = 0.0)
        .as[(Long, String)].collect().toSet
    val base = keptSet(Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))
    val bySrc = base.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("src0", 0) == 3000)     // fraction 1.0 exact
    assert(math.abs(bySrc.getOrElse("src1", 0) - 1500) < 120)
    assert(!bySrc.contains("src2"))                 // fraction 0.0 exact
    // raising one stratum's fraction only ADDS rows of that stratum
    val more = keptSet(Map("src0" -> 1.0, "src1" -> 0.8, "src2" -> 0.0))
    assert(base.subsetOf(more))
    assert((more -- base).forall(_._2 == "src1"))
    // the kept subset of a stratum equals hashSample at the same fraction
    val solo = Sampling.hashSample(docs.filter(col("source") === "src1"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(base.filter(_._2 == "src1").map(_._1) == solo)
    // default fraction drives unlisted strata
    val dflt = keptSet(Map("src0" -> 0.0, "src1" -> 0.0)) // src2 → default 0
    assert(dflt.isEmpty)
  }

  test("leakageSafeSplit: clusters move as units, singletons match " +
      "assignSplit, transitive chains stay together") {
    val docs = (0L until 100L).toDF("doc_id")
    // chain 1-2-3 (transitive closure must group all three) + pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Sampling.leakageSafeSplit(docs, pairs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 100)
    // every clustered doc carries the cluster's canonical (min) member
    // and therefore the same split
    for (grp <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L))) {
      assert(grp.map(out(_)._2).distinct == Seq(grp.min),
        s"cluster $grp not keyed by its min member")
      assert(grp.map(out(_)._4).distinct.size == 1,
        s"cluster $grp straddles splits")
    }
    // unpaired docs: identical to plain assignSplit
    val base = Sampling.assignSplit(docs)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    val clustered = Set(1L, 2L, 3L, 10L, 11L)
    docs.as[Long].collect().filterNot(clustered).foreach { id =>
      assert(out(id)._4 == base(id),
        s"unpaired doc $id moved: ${out(id)._4} vs ${base(id)}")
      assert(out(id)._2 == id)
    }
    // the canonical members' own assignment equals their plain split, so
    // cluster assignment = assignSplit of the min member
    assert(out(1L)._4 == base(1L) && out(10L)._4 == base(10L))
  }

  test("split assignment is a shuffle-free projection") {
    val plan = Sampling.assignSplit(ids).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"split must not shuffle:\n${plan.take(1000)}")
  }

  test("trainOrder: a total, balanced, deterministic permutation that is " +
      "decorrelated from id order") {
    val out = Sampling.trainOrder(ids, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every doc exactly once
    assert(out.length == 10000 && out.map(_._1).distinct.length == 10000)
    // positions are 1..count per shard (dense, no gaps)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // shards are hash-balanced: each within 3σ of 1250
    val sizes = out.groupBy(_._2).values.map(_.length)
    assert(sizes.size == 8 && sizes.forall(n => math.abs(n - 1250) < 120),
      s"unbalanced shards: $sizes")
    // deterministic under repartitioning
    val again = Sampling.trainOrder(ids.repartition(13), nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // decorrelated from ingest order: consecutive ids rarely adjacent in
    // the permutation (shard 0's first 100 positions span the id range)
    val s0 = out.filter(_._2 == 0).sortBy(_._3).take(100).map(_._1)
    assert(s0.max - s0.min > 5000, "shard order correlated with id order")
  }

  test("selectByBudget: maximal quality-ranked prefix within the budget, " +
      "partitioning-independent") {
    import org.apache.spark.sql.functions._
    // deterministic synthetic docs with varied lengths and quality bands
    val docs = (0L until 400L).map { i =>
      val words = 3 + (i * 7 % 40).toInt
      val base = Seq.fill(words)(s"w${i % 11}").mkString(" ")
      val text = if (i % 3 == 0) base + " the end of it." else base
      (i, text)
    }.toDF("doc_id", "text")
    val budget = 3000L
    val out = Sampling.selectByBudget(docs, budget,
      graft.text.TextOps.qualityScore(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._4)
    // brute-force reference: single driver-side rank + cumsum
    val ranked = docs.select(col("doc_id"),
      graft.text.TextOps.qualityScore(col("text")).as("score"),
      graft.text.TextOps.tokenCount(col("text")).cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, sc, _) => (-sc, id) }
    var cum = 0L
    val want = ranked.flatMap { case (id, sc, nt) =>
      cum += nt
      if (cum <= budget) Some((id, sc, nt, cum)) else None
    }
    assert(out.toSeq == want.toSeq)
    assert(out.map(_._3).sum <= budget)
    // maximality: the next-ranked unselected doc would overflow
    val nextNt = ranked.drop(want.length).headOption.map(_._3).getOrElse(0L)
    assert(want.isEmpty || nextNt == 0L ||
      out.map(_._3).sum + nextNt > budget)
    // partitioning-independent: same set under a different parts count
    val out2 = Sampling.selectByBudget(docs.repartition(7), budget,
      graft.text.TextOps.qualityScore(col("text")), parts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._4)
    assert(out2.toSeq == out.toSeq)
  }
}
