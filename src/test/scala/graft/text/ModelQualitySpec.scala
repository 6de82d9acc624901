package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based quality scoring: the hashed-linear inference plumbing —
  * exact mean-weight semantics, empty-doc handling, threshold
  * monotonicity, and the map-side plan shape (one explode, one partial
  * aggregation, no joins except the every-document attach).
  */
class ModelQualitySpec extends SparkSpec {
  import spark.implicits._

  private def w32(tok: String, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((tok + ":" + salt).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("score is the exact mean hashed weight; empty docs score 0 and " +
      "drop; keep thresholds correctly") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "ALPHA Beta gamma"), // normalizes to the same tokens as doc 1
      (3L, ""),
      (4L, "  "),
      (5L, "solo")).toDF("doc_id", "text")
    val out = TextOps.modelQualityScore(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    val expMean = Seq("alpha", "beta", "gamma").map(w32(_, "qw1")).sum
      .toDouble / (3.0 * 4294967296.0)
    assert(out(1L) == ((3L, expMean, expMean >= 0.5)))
    assert(out(2L) == out(1L), "case-normalized tokens must score equal")
    assert(out(3L) == ((0L, 0.0, false)) && out(4L) == ((0L, 0.0, false)))
    val soloScore = w32("solo", "qw1").toDouble / 4294967296.0
    assert(out(5L)._2 == soloScore)
    // threshold monotonicity: keep-set at 0.3 ⊇ keep-set at 0.7
    val keep3 = TextOps.modelQualityScore(docs, keepThreshold = 0.3)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    val keep7 = TextOps.modelQualityScore(docs, keepThreshold = 0.7)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(keep7.subsetOf(keep3))
  }

  test("modelQualityKeepCol matches the DataFrame form's keep decision " +
      "exactly (the streaming-gate parity)") {
    // one unique token per doc → scores are iid uniform, so the 0.5
    // threshold splits the set roughly in half
    val docs = ((0L until 200L).map(i => (i, s"word$i uniq${i * 31}")) ++
      Seq((900L, ""), (901L, "   "))).toDF("doc_id", "text")
    val batch = TextOps.modelQualityScore(docs)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    val streamGate = docs
      .filter(TextOps.modelQualityKeepCol(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(streamGate == batch)
    assert(batch.nonEmpty && batch.size < 200) // threshold splits the set
  }

  test("plan shape: one aggregation over the token explode, no shuffle " +
      "of text") {
    val docs = (0L until 100L).map(i => (i, s"tok$i common words here"))
      .toDF("doc_id", "text")
    val plan = TextOps.modelQualityScore(docs)
      .queryExecution.executedPlan.toString
    // per-doc partial aggregation (two HashAggregates around the
    // exchange) and the final every-document left join only
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(800))
    assert(!plan.contains("CartesianProduct"))
  }
}
