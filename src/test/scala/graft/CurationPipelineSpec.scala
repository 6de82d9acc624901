package graft

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Integration test of the composed training-data curation pipeline over
  * real testdata: exact dedup → MinHash near-dup survivor selection →
  * repeated-span coverage and quality filters. Asserts the invariants a
  * pipeline operator chain must keep, not per-operator correctness
  * (each stage has its own oracle/witness).
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def has: Boolean =
    new java.io.File(s"$sfDir/documents.parquet").exists()

  test("curation chain: dedup → survivors → coverage/quality filters " +
      "compose monotonically and keep invariants") {
    assume(has)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = docs.count()

    // stage 1: exact dedup keeps one canonical doc per normalized text
    val canonicalIds = Dedup.exact(docs).select("doc_id")
    val afterExact = docs.join(canonicalIds, "doc_id")
    val n1 = afterExact.count()
    assert(n1 <= n0 && n1 > 0)
    assert(afterExact.select("doc_id").distinct().count() == n1)

    // stage 2: near-dup survivors (lowest doc_id per dup pair group)
    val dups = Dedup.minhashNearDups(afterExact, threshold = 0.5)
    val afterNear = Dedup.survivors(afterExact, dups)
    val n2 = afterNear.count()
    assert(n2 <= n1 && n2 > 0)
    // no surviving doc may appear as a loser of any detected pair
    val losers = dups.select(col("doc_b").as("doc_id")).distinct()
    assert(afterNear.join(losers, "doc_id").count() == 0)

    // stage 3: span-coverage + quality scoring on the survivors
    val coverage = Dedup.spanCoverage(afterNear, k = 10, minDocs = 2)
    assert(coverage.count() == n2) // every survivor is scored
    assert(coverage.filter(col("coverage") < 0 || col("coverage") > 1)
      .count() == 0)
    val kept = afterNear
      .join(coverage.select("doc_id", "coverage"), "doc_id")
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("coverage") <= 0.5 && col("quality") >= 4)
    val n3 = kept.count()
    assert(n3 <= n2 && n3 > 0, s"pipeline: $n0 -> $n1 -> $n2 -> $n3")

    // the chain is a pure filter: every kept doc is an original row
    assert(kept.select("doc_id").join(docs, "doc_id").count() == n3)
  }
}
