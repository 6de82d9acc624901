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
}
