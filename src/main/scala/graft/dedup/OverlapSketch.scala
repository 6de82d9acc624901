package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) corpus-overlap sketch — "how much does corpus
  * B overlap corpus A?" answered without shuffling either corpus against
  * the other. The planning question behind dedup/decontamination runs:
  * a full anti-join over two crawls is a corpus×corpus shuffle, while a
  * KMV sketch is one TakeOrderedAndProject per side (k rows to the
  * driver) and gives |A∩B| / |A∪B| to ~1/sqrt(k) relative error
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM 2002; Beyer et al., SIGMOD 2007 for the unbiased KMV
  * estimator).
  *
  * Determinism: the hash is the md5 content fingerprint (a fixed-width
  * hex STRING; lexicographic min-k of uniformly distributed hex strings
  * is an order-preserving stand-in for numeric min-k), so the sketch —
  * and therefore the ESTIMATE, not just the underlying sets — is a
  * deterministic function of the corpora: the whole operator carries an
  * exact DuckDB oracle, and the statistical claim is witnessed
  * separately on planted corpora.
  *
  * Scale shape: `orderBy(fp).limit(k)` plans as TakeOrderedAndProject
  * (per-partition top-k + driver merge of k×partitions rows — never a
  * global sort); the estimate combines two k-row driver-side sets.
  */
object OverlapSketch {

  /** Normalized-content fingerprint (same normalization as exact dedup). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** The k lexicographically smallest DISTINCT fingerprints. Null text
    * rows are excluded — Spark sorts NULL first while the SQL oracle
    * sorts it last, and a null fingerprint occupying a sketch slot
    * would silently bias the estimate.
    */
  def kmvSketch(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0 && k <= (1 << 20), s"k out of range: $k")
    docs.select(fingerprint(col(textCol)).as("fp"))
      .filter(col("fp").isNotNull)
      .distinct()
      .orderBy(col("fp"))
      .limit(k)
  }

  /** Jaccard / intersection estimate from the two sketches.
    *
    * KMV combine: the union's sketch is the k smallest of the merged
    * sketches; J ≈ |{v ∈ unionSketch : v ∈ A-sketch ∧ v ∈ B-sketch}| / k'
    * where k' = |unionSketch|. Distinct-count estimates use the k-th
    * minimum as a threshold: D ≈ (k'-1) / frac(maxHash) — here rank
    * fractions of the hex space. All counts in the output are exact
    * integers (deterministic), the ratios are derived client-side.
    *
    * @return one row: (k_union, n_common, est_jaccard_ppm) — parts per
    *         million so the headline stays integer-exact.
    */
  def overlapEstimate(a: DataFrame, b: DataFrame, textCol: String,
      k: Int): DataFrame = {
    val sa = kmvSketch(a, textCol, k)
    val sb = kmvSketch(b, textCol, k)
    val merged = sa.select(col("fp"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(sb.select(col("fp"), lit(0).as("in_a"),
        lit(1).as("in_b")))
      .groupBy("fp").agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .orderBy("fp").limit(k)
    merged.agg(
      count(lit(1)).as("k_union"),
      sum((col("in_a") * col("in_b")).cast("long")).as("n_common"),
      // ppm = 10^6 * n_common / k_union, exact integer arithmetic
      expr("(1000000L * sum(CAST(in_a * in_b AS BIGINT))) div count(1)")
        .as("est_jaccard_ppm"))
  }
}
