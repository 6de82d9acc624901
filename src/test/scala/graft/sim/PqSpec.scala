package graft.sim

import graft.SparkSpec
import graft.text.TextHash
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // same clustered corpus as SimilaritySpec: 4 separated centers ± noise
  private lazy val vecs: Seq[(Long, Array[Float])] = (0L until 200L).map { i =>
    val cluster = (i % 4).toInt
    val v = Array.tabulate(16) { d =>
      val center = if (d % 4 == cluster) 1.0f else 0.0f
      val noise = ((TextHash.mix(i, d.toLong) % 1000) / 50000.0f)
      center + noise
    }
    (i, v)
  }
  private lazy val emb = vecs.toDF("vec_id", "embedding")

  private def normed(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    v.map(x => (x / n).toFloat)
  }

  test("trainCodebooks is deterministic and shapes match widths") {
    val sample = vecs.take(64).map(_._2).toArray
    val b1 = Pq.trainCodebooks(sample, m = 4, ks = 8, iters = 3)
    val b2 = Pq.trainCodebooks(sample, m = 4, ks = 8, iters = 3)
    assert(b1.length == 4)
    assert(b1.forall(_.length == 8))
    assert(b1.flatten.forall(_.length == 4)) // 16 dims / 4 subspaces
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq ==
      b2.map(_.map(_.toSeq).toSeq).toSeq)
    // uneven dim split: widths distribute the remainder
    val b3 = Pq.trainCodebooks(sample, m = 5, ks = 4, iters = 1)
    assert(b3.map(_.head.length).toSeq == Seq(4, 3, 3, 3, 3))
  }

  test("ADC score of a vector against its own codes approximates 1") {
    val sample = vecs.take(128).map(_._2).toArray
    val books = Pq.trainCodebooks(sample, m = 8, ks = 16, iters = 5)
    vecs.take(20).foreach { case (_, v) =>
      val codes = Pq.encode(v, books)
      assert(codes.length == 8)
      val lut = Pq.adcLut(v, books, ks = 16)
      val s = Pq.adcScore(codes, lut, ks = 16)
      // self-similarity ≈ cosine(v, v) = 1 modulo quantization error
      assert(s > 0.9 && s <= 1.05, s"self ADC score $s out of range")
    }
  }

  test("ADC ranking tracks exact cosine: quantized self beats cross-cluster") {
    val sample = vecs.take(128).map(_._2).toArray
    val books = Pq.trainCodebooks(sample, m = 8, ks = 16, iters = 5)
    val q = vecs.head._2 // cluster 0
    val lut = Pq.adcLut(q, books, ks = 16)
    val same = Pq.adcScore(Pq.encode(vecs(4)._2, books), lut, 16) // cluster 0
    val cross = Pq.adcScore(Pq.encode(vecs(1)._2, books), lut, 16) // cluster 1
    assert(same > cross,
      s"in-cluster ADC $same should beat cross-cluster $cross")
    val exactSame = TextHash.cosine(normed(q).toSeq, normed(vecs(4)._2).toSeq)
    assert(math.abs(same - exactSame) < 0.15,
      s"ADC $same vs exact $exactSame drifted past quantization error")
  }

  test("pqTopK: high recall vs brute force on clustered data, exact cos values") {
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "corpus_id", "cos")
      .as[(Long, Long, Double)].collect()
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    val bruteCos = brute.map(r => (r._1, r._2) -> r._3).toMap
    // refine = 12: this fixture's in-cluster neighbors are near-TIES
    // (cosines differ by ~1e-4 — far below PQ quantization error), so the
    // ADC shortlist must span the whole ~50-member tie band for the exact
    // re-rank to recover the true top-5 — exactly the refine-depth dial
    // the published IVFPQ+refine design exposes for tie-dense corpora
    val ann = Pq.pqTopK(emb, queries, k = 5, m = 8, ks = 16,
      nlist = 8, nprobe = 4, refine = 12)
      .select("query_id", "corpus_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(ann.map(_._1).distinct.length == 8)
    val annSet = ann.map(r => (r._1, r._2)).toSet
    val recall = (annSet & bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.8, s"IVF-PQ recall $recall < 0.8")
    // default refine depth still recovers a useful majority through the
    // ADC tie scramble
    val annDefault = Pq.pqTopK(emb, queries, k = 5, m = 8, ks = 16,
      nlist = 8, nprobe = 4)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert((annDefault & bruteSet).size.toDouble / bruteSet.size >= 0.5)
    // emitted cosines are the EXACT re-ranked values — bit-equal to the
    // brute-force kernel wherever the pair overlaps
    ann.foreach { case (q, c, cos) =>
      bruteCos.get((q, c)).foreach(exp => assert(cos == exp,
        s"pair ($q,$c): re-ranked cos $cos != brute $exp"))
    }
  }

  test("pqTopK is deterministic across runs and repartitionings") {
    val queries = emb.filter(col("vec_id") < 4)
    def run(df: org.apache.spark.sql.DataFrame) =
      Pq.pqTopK(df, df.filter(col("vec_id") < 4), k = 5, m = 4, ks = 8,
        nlist = 8, nprobe = 3)
        .orderBy("query_id", "rank")
        .select("query_id", "corpus_id", "rank")
        .as[(Long, Long, Int)].collect().toSeq
    assert(run(emb) == run(emb.repartition(7)))
  }
}
