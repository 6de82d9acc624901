package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling — the operators a 100 TB join/aggregation
  * pipeline reaches for when AQE's runtime skew splitting is not enough
  * (or not available: AQE splits SORT-MERGE join partitions, but a
  * skewed AGGREGATION key or a skewed broadcast-probe stays hot).
  *
  *  - `keyStats` is the audit: which keys are hot, and how hot — the
  *    number a pipeline report quotes before choosing a mitigation;
  *  - `saltedAggregate` is the classic two-stage combine: partials on
  *    (key, salt) spread one hot key over `salts` reducers, then a
  *    second tiny aggregation collapses the partials — bit-identical
  *    results for any commutative-associative aggregate;
  *  - `saltedJoin` replicates the (small) build side `salts`× so a
  *    skewed probe key's rows scatter across `salts` tasks instead of
  *    one straggler — same rows as the plain join, order excepted.
  *
  * Everything is deterministic (salts derive from row hashes, never
  * `rand()`), so results are reproducible and the equality properties
  * are testable exactly.
  *
  * Known limitation of row-hash salting: rows that are FULLY duplicate
  * under a hot key (e.g. repeated null/default rows) hash to the same
  * salt and still land on one reducer, so the mitigation does not spread
  * them. A deterministic disambiguator does not exist for identical rows
  * (spark_partition_id + per-partition index is not stable across
  * retries/AQE); if full-duplicate hot rows are the skew shape,
  * pre-aggregate them to (row, count) first — the collapsed table has no
  * duplicates left to spread.
  */
object Skew {

  /** Hot-key audit: the `topN` heaviest keys with row counts and corpus
    * share (exact integer-ratio double). One partial-agg shuffle over
    * (key) plus a driver-sized TakeOrdered; ties break on the key string
    * so the result set is deterministic. NULL keys count as a key (they
    * are the most common real-world skew).
    */
  def keyStats(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, s"need topN >= 1, got $topN")
    // ONE scan of the input: the per-key aggregate is materialized (it is
    // a key-cardinality-sized table), then both consumers — the total-row
    // denominator and the TakeOrdered topN — read the checkpoint. The
    // previous `df.count()` denominator re-scanned the full input a second
    // time (a wasted full pass at 100 TB); Catalyst would not CSE the agg
    // across the two consumers either, hence the explicit boundary.
    // no spread(): the pre-exchange side is a trivial projection, so the
    // aggregation's own exchange is the parallelism point (guide §2.4)
    val counts = graft.core.SparkUtil.materializeOnce(
      df.groupBy(col(keyCol).cast("string").as("key"))
        .agg(count(lit(1)).as("n")))
    val total = lit(counts.agg(coalesce(sum(col("n")), lit(0L)))
      .first().getLong(0))
    counts
      .withColumn("share", col("n").cast("double") / total)
      .orderBy(col("n").desc, col("key").asc_nulls_last)
      .limit(topN)
  }

  /** Salted two-stage aggregation: `sum`s and `count`s per key computed
    * as (key, salt) partials first — a hot key's rows spread across
    * `salts` reducers — then combined. The salt is a pure function of
    * the whole row's hash (no RNG state), so the result is reproducible
    * AND bit-identical to the direct aggregation: integer sums are
    * order-free, and the two-stage double sum is only exposed through
    * columns the caller asked to sum (document FP caveats at the call
    * site if summing doubles).
    *
    * @param sums columns to sum (pass integer/decimal columns for
    *             bit-exact cross-engine results)
    */
  def saltedAggregate(df: DataFrame, keyCol: String, sums: Seq[String],
      salts: Int = 16): DataFrame = {
    require(salts >= 1, s"need salts >= 1, got $salts")
    require(!df.columns.contains("__salt"),
      "input already has a __salt column (reserved by saltedAggregate)")
    val salted = df
      .withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val partial = salted.groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sums.map(c => sum(col(c)).as(s"__s_$c")): _*)
    partial.groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"),
        sums.map(c => sum(col(s"__s_$c")).as(s"sum_$c")): _*)
  }

  /** Salted equi-join for a skewed probe side: the build side (small —
    * a dictionary, dimensions, a dedup index) is replicated `salts`
    * times and the probe side routes each row to one replica by its row
    * hash, so one hot key's probe rows land on `salts` tasks. Returns
    * exactly the plain join's rows. The build side is broadcast when it
    * fits (the hint is left to Spark/AQE — replication already happened
    * logically via the explode, which the broadcast absorbs for free).
    *
    * At 100 TB this is the shape for a shuffle join whose probe side has
    * keys AQE cannot split (aggregated upstream, or a storage-partitioned
    * join): the probe NEVER re-shuffles by the raw skewed key alone —
    * always by (key, salt).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, s"need salts >= 1, got $salts")
    require(!probe.columns.contains("__salt") &&
        !build.columns.contains("__salt"),
      "input already has a __salt column (reserved by saltedJoin)")
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    val p = probe
      .withColumn("__salt",
        pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(salts)))
    // SHUFFLE_HASH on the replicated build side: it hashes in O(n) per
    // partition while the probe streams unsorted — a sort-merge join
    // would sort the salts-times-replicated build AND the probe (guide
    // §3.1); the salt in the key already bounds per-partition build size,
    // and AQE may still upgrade to broadcast when the build fits
    p.join(b.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
