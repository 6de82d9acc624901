package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range (interval) join — the brief's canonical example of
  * an operator Spark lacks natively. Spark plans `a.lo <= b.ts AND
  * b.ts < a.hi` as a broadcast-nested-loop or cartesian: O(|A|·|B|)
  * comparisons and a non-shufflable predicate. This operator makes it
  * an EQUI-join by time-binning.
  *
  * Shape: interval rows replicate over the fixed-width bins they cover
  * (bounded by `maxBinsPerInterval`, fail-loud via `raise_error` inside
  * the plan); a probe point belongs to exactly ONE bin; the (key, bin)
  * equi-join therefore meets each qualifying pair exactly once — no
  * post-join dedup shuffle, the same exactly-once-by-construction trick
  * as the simhash canonical band. The exact predicate filters inside
  * the join stage. AQE handles residual bin skew; replication factor =
  * ceil(interval span / binWidth), chosen by the caller to balance
  * build amplification vs probe selectivity.
  */
object RangeJoin {

  /** @param intervals rows with (`keyCol`, `loCol`, `hiCol`, …) — the
    *                  interval is the half-open [lo, hi), lo/hi LONG in
    *                  the caller's epoch unit
    * @param probes    rows with (`keyCol`, `tsCol`, …) — ts LONG, same
    *                  unit; a null ts matches nothing (null bin never
    *                  equi-joins), while a null interval bound raises
    * @param binWidth  bin width in the same unit
    * @return each (interval row ⧺ probe row) with key shared and
    *         lo <= ts < hi, exactly once; all non-key columns of both
    *         sides are carried (names must not collide)
    */
  def intervalJoin(intervals: DataFrame, probes: DataFrame,
      binWidth: Long, keyCol: String = "key", loCol: String = "lo",
      hiCol: String = "hi", tsCol: String = "ts",
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val reserved = "__bin"
    require(!intervals.columns.contains(reserved) &&
      !probes.columns.contains(reserved),
      s"inputs must not carry a $reserved column (reserved)")
    val overlap = (intervals.columns.toSet & probes.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"non-key column names collide across sides: ${overlap.mkString(", ")}")
    val lo = col(loCol); val hi = col(hiCol)
    // true floor division (Spark's `div` truncates toward zero, which
    // mis-bins negative epochs): (a - pmod(a, w)) div w
    def floorDiv(e: String): String =
      s"(($e) - pmod($e, $binWidth)) div $binWidth"
    // half-open: the last covered bin is the one holding hi - 1
    val binLo = expr(floorDiv(loCol))
    val binHi = expr(floorDiv(s"$hiCol - 1"))
    val iv = intervals
      .withColumn(reserved, explode(
        // a null bound would null the guard conditions AND the sequence,
        // silently vanishing the row via explode — fail loud instead
        when(lo.isNull || hi.isNull,
          raise_error(lit("null interval bound (lo/hi must be set)")))
          .when(lo >= hi, raise_error(concat(lit("empty interval: lo="),
            lo, lit(" hi="), hi)))
          .when(binHi - binLo >= lit(maxBinsPerInterval.toLong),
            raise_error(concat(
              lit(s"interval spans more than $maxBinsPerInterval bins "),
              lit("(widen binWidth or split the interval): lo="),
              lo, lit(" hi="), hi)))
          .otherwise(sequence(binLo, binHi))))
    val probe = probes
      .withColumn(reserved, expr(floorDiv(tsCol)))
    iv.join(probe, Seq(keyCol, reserved))
      .filter(col(tsCol) >= lo && col(tsCol) < hi)
      .drop(reserved)
  }
}
