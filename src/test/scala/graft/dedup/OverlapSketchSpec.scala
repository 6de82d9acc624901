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
}
