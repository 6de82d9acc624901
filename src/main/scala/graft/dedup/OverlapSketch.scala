package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Exact pairwise shingle-set Jaccard between sources — the corpus
    * provenance similarity matrix (which feeds charge "crawl X is 40 %
    * snapshot Y" mix decisions). Same word-3-gram shingle kernel as the
    * document-level near-dup family.
    *
    * Scale shape: one DISTINCT (source, shingle) pass, then a self-join
    * keyed on the shingle whose fan-out per shingle is C(m, 2) over the
    * m sources sharing it — bounded by the SOURCE dimension squared, an
    * enumerable dimension (thousands), never the corpus. For source
    * counts past that, [[sourceJaccardKmv]] is the sketch arm. All
    * output counts are integers; the ppm ratio is integer division —
    * the whole matrix is DuckDB-oracled exactly.
    *
    * @return (src_a, src_b, n_a, n_b, n_common, jaccard_ppm) for pairs
    *         sharing at least one shingle, src_a < src_b.
    */
  def sourceJaccard(docs: DataFrame, k: Int = 3): DataFrame = {
    val sh = graft.core.SparkUtil.materializeOnce(
      docs.select(col("source"),
        explode(Dedup.shingles(col("text"), k)).as("s"))
        .distinct())
    val sz = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val ip = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    ip.join(sz.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sz.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_common"),
        expr("(1000000L * n_common) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }

  /** KMV-sketch arm of [[sourceJaccard]]: per-source k-minimum-values
    * sketches over md5 shingle fingerprints, combined pairwise. The
    * per-source sketch is a row_number window (top-k of DISTINCT
    * fingerprints per source — one shuffle keyed by source); the
    * pairwise combine touches only S·k sketch rows replicated across
    * S−1 partners: the corpus is read ONCE no matter how many source
    * pairs are estimated, where the exact arm's shingle self-join
    * re-shuffles corpus-sized shingle tables.
    *
    * Deterministic md5 order ⇒ the sketches and every estimate are pure
    * functions of the corpus: this arm carries its own exact DuckDB
    * oracle, and the ~1/sqrt(k) accuracy vs the exact arm is witnessed
    * in OverlapSketchSpec.
    *
    * @return (src_a, src_b, k_union, n_common, est_jaccard_ppm) for ALL
    *         source pairs (src_a < src_b), sharing shingles or not.
    */
  def sourceJaccardKmv(docs: DataFrame, k: Int = 3,
      sketchK: Int = 128): DataFrame = {
    require(sketchK > 0 && sketchK <= (1 << 20),
      s"sketchK out of range: $sketchK")
    val sk = graft.core.SparkUtil.materializeOnce(
      docs.select(col("source"),
        explode(Dedup.shingles(col("text"), k)).as("s"))
        .select(col("source"), md5(col("s")).as("fp"))
        .distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy("fp")))
        .filter(col("rn") <= sketchK)
        .drop("rn"))
    val srcs = sk.select("source").distinct()
    // the source-pair cross is the one deliberate non-equi join (S²
    // rows over an enumerable dimension); it feeds BOTH union branches
    // below, so materialize its S²-row result once — the final plan
    // then contains no nested-loop join at all (PlanAuditSpec)
    val pairs = srcs.as("x").join(srcs.as("y"),
      col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .localCheckpoint(true)
    val sides = pairs
      .join(sk.select(col("source").as("src_a"), col("fp"),
        lit(1).as("in_a"), lit(0).as("in_b")), "src_a")
      .unionByName(pairs
        .join(sk.select(col("source").as("src_b"), col("fp"),
          lit(0).as("in_a"), lit(1).as("in_b")), "src_b"))
    val merged = sides
      .groupBy("src_a", "src_b", "fp")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("src_a", "src_b").orderBy("fp")))
      .filter(col("rn") <= sketchK)
    merged.groupBy("src_a", "src_b").agg(
      count(lit(1)).as("k_union"),
      sum((col("in_a") * col("in_b")).cast("long")).as("n_common"),
      expr("(1000000L * sum(CAST(in_a * in_b AS BIGINT))) div count(1)")
        .as("est_jaccard_ppm"))
  }
}
