package graft.core

import org.apache.spark.sql.DataFrame

object SparkUtil {

  /** Spread a small input across the cluster when its file layout yields
    * fewer partitions than cores. Parquet byte-range splits are planned
    * per `maxPartitionBytes`/`openCostInBytes`, but a task only emits the
    * row groups whose midpoint lands in its range — a small file with ONE
    * row group reads as ONE non-empty partition no matter how many splits
    * are planned, silently serializing every downstream map-heavy stage
    * (measured: the simhash band explode+join and the cosine cross join
    * ran single-threaded at bench scale). No-op when the input is already
    * at least as parallel as the cluster, so at real corpus scale (many
    * row groups) this adds nothing.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Materialization boundary for operators that consume a DataFrame from
    * several plan branches: Catalyst does not CSE across branches, so
    * without a boundary the upstream plan re-executes once PER branch
    * (measured live on the reconcile at sf0.1: 18 re-scans of the source
    * parquet and 61 exchanges in one executed plan). An eager
    * localCheckpoint caps that at one execution. Inputs whose plan is
    * scan-shaped (no aggregate/join/dedup/generate/sort upstream) are
    * left alone: re-reading a columnar scan 2-3× streams and costs no
    * shuffle, while checkpointing a 100 TB raw input would copy it to
    * executor storage for no savings. Operators whose expensive stage is
    * a plain projection (LSH signature UDFs) checkpoint explicitly
    * instead — a Project node is invisible to this heuristic.
    */
  def materializeOnce(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val expensive = df.queryExecution.logical.collectFirst {
      case _: Aggregate | _: Join | _: Deduplicate | _: Distinct |
           _: Window | _: Generate | _: Sort => true
    }.nonEmpty
    if (expensive) df.localCheckpoint(eager = true) else df
  }
}
