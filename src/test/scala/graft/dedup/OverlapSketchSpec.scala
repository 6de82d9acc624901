package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OverlapSketchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range): Seq[(Long, String)] =
    ids.map(i => (i.toLong, s"document body number $i with words"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("planted 20% Jaccard recovered within the KMV error bound") {
    // |A∪B| = 2000, |A∩B| = 400 → J = 0.2; k = 256 → σ ≈ J/sqrt(k)
    val a = corpus(0 until 1200).toDF("doc_id", "text")
    val b = corpus(800 until 2000).toDF("doc_id", "text")
    val row = OverlapSketch.overlapEstimate(a, b, "text", k = 256).head()
    val est = row.getAs[Long]("est_jaccard_ppm") / 1e6
    assert(row.getAs[Long]("k_union") == 256L)
    assert(math.abs(est - 0.2) < 0.08,
      s"estimate $est too far from planted 0.2")
  }

  test("k >= |A ∪ B| degenerates to the exact Jaccard") {
    val a = corpus(0 until 60).toDF("doc_id", "text")
    val b = corpus(40 until 100).toDF("doc_id", "text")
    val row = OverlapSketch.overlapEstimate(a, b, "text", k = 1000).head()
    assert(row.getAs[Long]("k_union") == 100L)
    assert(row.getAs[Long]("n_common") == 20L)
    assert(row.getAs[Long]("est_jaccard_ppm") == 1000000L * 20L / 100L)
  }

  test("the sketch is the deterministic k-min of md5 fingerprints " +
      "(driver recomputation, duplicate texts collapse first)") {
    val texts = corpus(0 until 150).map(_._2)
    // duplicates must not occupy sketch slots
    val withDups = (texts ++ texts.take(50)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = OverlapSketch.kmvSketch(withDups.toDF("doc_id", "text"),
      "text", k = 32).as[String].collect().toSeq
    val want = texts.map(t =>
        md5hex(t.toLowerCase.trim.replaceAll("\\s+", " ")))
      .distinct.sorted.take(32)
    assert(got.sorted == want)
  }

  test("sourceJaccard: exact matrix on a handmade two-source overlap") {
    // sources share exactly the shingles of the common middle sentence
    val docs = Seq(
      (1L, "alpha beta gamma delta", "sa"),
      (2L, "shared words appear here", "sa"),
      (3L, "shared words appear here", "sb"),
      (4L, "epsilon zeta eta theta", "sb")
    ).toDF("doc_id", "text", "source")
    val out = OverlapSketch.sourceJaccard(docs, k = 3)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // each 4-word doc has 2 distinct 3-gram shingles → n=4 per source,
    // 2 common → J = 2/6
    assert(out == Seq(("sa", "sb", 4L, 4L, 2L, 1000000L * 2 / 6)))
  }

  test("sourceJaccardKmv: estimates within the 1/sqrt(k) band of the " +
      "exact matrix; degenerate k covers the whole union exactly") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = OverlapSketch.sourceJaccard(docs, k = 3)
      .select("src_a", "src_b", "jaccard_ppm")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val est = OverlapSketch.sourceJaccardKmv(docs, k = 3, sketchK = 256)
      .select("src_a", "src_b", "est_jaccard_ppm")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est.keySet.size >= exact.keySet.size,
      "sketch arm must cover every pair the exact arm found")
    // KMV absolute error ~ 1/sqrt(k) of the UNION fraction; allow 3σ
    val band = (3.0 / math.sqrt(256.0) * 1e6).toLong
    exact.foreach { case (pair, j) =>
      val e = est(pair)
      assert(math.abs(e - j) <= band,
        s"pair $pair: estimate $e vs exact $j exceeds ±$band ppm")
    }
    // sketchK past every per-source distinct-shingle count ⇒ the merged
    // top-k IS the union: the estimate degenerates to the exact value
    val tiny = Seq(
      (1L, "one two three four five", "p"),
      (2L, "one two three four five six", "q")
    ).toDF("doc_id", "text", "source")
    val d = OverlapSketch.sourceJaccardKmv(tiny, k = 3, sketchK = 4096)
      .head()
    val x = OverlapSketch.sourceJaccard(tiny, k = 3).head()
    assert(d.getAs[Long]("est_jaccard_ppm") == x.getAs[Long]("jaccard_ppm"))
    assert(d.getAs[Long]("k_union") ==
      x.getAs[Long]("n_a") + x.getAs[Long]("n_b") - x.getAs[Long]("n_common"))
  }
}
