package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate anomaly detection — the pipeline-health monitor over an
  * event stream: bucket events into fixed epochs per type, then flag
  * buckets whose count deviates from the type's median by more than
  * `kPermille`/1000 × the type's MAD (median absolute deviation) — the
  * robust z-score, immune to the outliers it hunts (a mean/stddev gate
  * moves with the spike it should flag).
  *
  * Exactness: "median" is the LOWER median (the element at 1-based rank
  * ⌊(n+1)/2⌋ under the strict total order (value, bucket) — never an
  * interpolated average, which would be fractional for integer counts),
  * so med, MAD and the flag are all-long and hash-match a SQL oracle
  * computing the same rank. MAD floors at 1 (a type with constant
  * counts has MAD 0; any deviation is then flagged at every k, which is
  * the behavior a monitor wants).
  *
  * Scale shape: the ONLY corpus-sized exchange is the (type, bucket)
  * count partial-agg. Everything after runs on the counts table —
  * |types| × |buckets| rows; the per-type rank windows are bounded by
  * bucket count (a year of hourly buckets is 8 760 rows per type),
  * never by event volume.
  *
  * @return (event_type, bucket, n, med, mad, is_anomaly) — one row per
  *         observed (type, bucket); empty buckets are not synthesized
  *         (a silent source is a different monitor's job).
  */
object Anomaly {

  def eventRateOutliers(events: DataFrame, bucketSeconds: Long = 3600L,
      kPermille: Long = 3000L): DataFrame = {
    require(bucketSeconds > 0L, s"need bucketSeconds > 0, got $bucketSeconds")
    require(kPermille >= 0L, s"need kPermille >= 0, got $kPermille")
    val counts = events
      .select(col("event_type"),
        expr(s"(unix_millis(cast(ts as timestamp)) div 1000)" +
          s" div ${bucketSeconds}L").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the median, the MAD and the output

    // lower median of `valueCol` per type over a tiny keyed table
    def lowerMedian(df: DataFrame, valueCol: String): DataFrame = {
      val w = Window.partitionBy("event_type")
      df.withColumn("__rn", row_number().over(
          w.orderBy(col(valueCol).asc, col("bucket").asc)).cast("long"))
        .withColumn("__cnt", count(lit(1)).over(w))
        .filter(col("__rn") === expr("(__cnt + 1) div 2"))
        .select(col("event_type"), col(valueCol).as("__med"))
    }

    val med = lowerMedian(counts, "n")
      .withColumnRenamed("__med", "med")
    val withMed = counts.join(med, Seq("event_type"))
      .withColumn("abs_dev", abs(col("n") - col("med")))
    val mad = lowerMedian(
      withMed.select(col("event_type"), col("bucket"),
        col("abs_dev").as("n")), "n")
      .withColumnRenamed("__med", "mad")
    withMed.join(mad, Seq("event_type"))
      .select(col("event_type"), col("bucket"), col("n"), col("med"),
        col("mad"),
        (col("abs_dev") * 1000L >
          lit(kPermille) * greatest(col("mad"), lit(1L))).as("is_anomaly"))
  }
}
