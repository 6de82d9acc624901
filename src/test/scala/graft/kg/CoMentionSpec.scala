package graft.kg

import graft.SparkSpec

class CoMentionSpec extends SparkSpec {
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame, minConvs: Int = 2,
      maxPerConv: Int = 64) =
    CoMention.mine(df, minConvs, maxPerConv)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet

  test("hand-built links: pair counts, conv frequencies and lift are " +
      "exact; duplicate turns don't inflate anything") {
    val links = Seq(
      // conv 1 mentions A, B (B twice — set semantics), conv 2: A, B,
      // conv 3: A, C, conv 4: C alone
      ("c1", "A"), ("c1", "B"), ("c1", "B"),
      ("c2", "A"), ("c2", "B"),
      ("c3", "A"), ("c3", "C"),
      ("c4", "C")
    ).toDF("conv_id", "concept_id")
    // N=4 convs; cf: A=3 B=2 C=2; pairs: (A,B)=2, (A,C)=1(<minConvs)
    // lift(A,B) = 2*1000*4 div (3*2) = 1333
    assert(run(links) == Set(("A", "B", 2L, 3L, 2L, 1333L)))
    // minConvs=1 admits (A,C): 1*1000*4 div (3*2) = 666
    assert(run(links, minConvs = 1) == Set(
      ("A", "B", 2L, 3L, 2L, 1333L), ("A", "C", 1L, 3L, 2L, 666L)))
  }

  test("equals brute force on random links; partition-invariant") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.tabulate(1500) { _ =>
      (s"c${rnd.nextInt(80)}", s"K${rnd.nextInt(25)}")
    }
    val df = rows.toDF("conv_id", "concept_id")
    val got = run(df, minConvs = 2)
    val byConv = rows.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val n = byConv.size.toLong
    val cf = byConv.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expect = byConv.values.flatMap { cs =>
      for (i <- cs.indices; j <- (i + 1) until cs.length)
        yield (cs(i), cs(j))
    }.groupBy(identity).collect {
      case (p, xs) if xs.size >= 2 =>
        val nab = xs.size.toLong
        (p._1, p._2, nab, cf(p._1), cf(p._2),
          nab * 1000L * n / (cf(p._1) * cf(p._2)))
    }.toSet
    assert(got == expect)
    assert(run(df.repartition(9), minConvs = 2) == got)
  }

  test("maxPerConv keeps the lexicographically smallest concepts and " +
      "bounds the pair stage") {
    val links = (1 to 10).map(i => ("c1", f"K$i%02d")) ++
      Seq(("c2", "K01"), ("c2", "K02"))
    val df = links.toDF("conv_id", "concept_id")
    val capped = run(df, minConvs = 1, maxPerConv = 3)
    // conv 1 contributes only pairs over {K01, K02, K03}
    assert(capped.map(t => (t._1, t._2)) ==
      Set(("K01", "K02"), ("K01", "K03"), ("K02", "K03")))
    // cf is post-cap: K04..K10 never exist in the capped universe
    val k1 = capped.find(t => t._1 == "K01" && t._2 == "K02").get
    assert(k1._3 == 2L && k1._4 == 2L && k1._5 == 2L) // both convs
    // n_ab <= min(cf_a, cf_b) by construction
    capped.foreach(t => assert(t._3 <= math.min(t._4, t._5)))
  }

  test("integration: mines relation candidates from the synthetic " +
      "linked transcripts deterministically") {
    val cfg = KgPipeline.Config(outDir = "", nConv = 120L,
      turnsPerConv = 6, nConcepts = 60L)
    val m = KgPipeline.extractMappings(spark, cfg)
    val a = CoMention.mine(m, convCol = graft.core.Schema.MappingSource,
      conceptCol = graft.core.Schema.ObjectId)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(a.nonEmpty, "synthetic corpus must yield co-mention edges")
    a.foreach { t =>
      assert(t._1 < t._2, "pair order is canonical")
      assert(t._3 <= math.min(t._4, t._5), "n_ab bounded by conv freqs")
      assert(t._6 >= 0L)
    }
    val b = CoMention.mine(m.repartition(7),
      convCol = graft.core.Schema.MappingSource,
      conceptCol = graft.core.Schema.ObjectId)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(b == a)
  }
}
