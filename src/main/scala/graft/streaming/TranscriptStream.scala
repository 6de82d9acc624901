package graft.streaming

import graft.kg.Linker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming ingestion for transcript tables.
  *
  * The reference is batch-only (SURVEY §2.10); this module covers the
  * streaming arm of the engine: a transcript micro-batch stream drives
  *  - watermarked windowed turn statistics (event-time, late data bounded
  *    by the watermark), and
  *  - incremental entity linking via `foreachBatch`, writing SSSOM rows
  *    into the bucketed Parquet layout. foreachBatch is at-least-once, so
  *    each micro-batch overwrites its own batchId-keyed subdirectory —
  *    a replayed batch rewrites the same directory and the table stays
  *    exactly-once at the directory level.
  */
object TranscriptStream {

  val transcriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    StructField("tool", StringType), StructField("ts", TimestampType)))

  def readTranscriptStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(transcriptSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(inputDir)

  /** Watermarked per-window, per-role turn statistics. */
  def turnStats(stream: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        avg(length(col("text"))).as("avg_chars"))

  /** Streaming exact dedup (the streaming arm of `Dedup.exact`): the
    * first occurrence of each normalized-content fingerprint survives;
    * duplicates whose event times differ are still caught as long as
    * they arrive within the watermark of each other
    * (`dropDuplicatesWithinWatermark`), and expired fingerprints age out
    * of the state store — state is bounded by the watermark horizon, the
    * property that keeps this runnable forever on an unbounded corpus.
    */
  def dedupStream(stream: DataFrame, watermark: String = "2 hours")
      : DataFrame =
    stream
      .withWatermark("ts", watermark)
      .withColumn("fingerprint",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Incremental linking: each micro-batch runs mention detection + exact
    * dictionary linking and appends SSSOM rows partitioned by subject-hash
    * bucket. The streaming checkpoint makes the job resumable — the
    * streaming analogue of the batch ledger.
    */
  def linkStream(spark: SparkSession, inputDir: String, outDir: String,
      dictionary: DataFrame, checkpointDir: String,
      availableNow: Boolean = false): StreamingQuery = {
    val stream = readTranscriptStream(spark, inputDir)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val mentions = Linker.detectMentions(batch)
        val links = Linker.linkExact(mentions, dictionary)
        Linker.toSssomRows(links)
          .withColumn("bucket",
            pmod(xxhash64(col("subject_id")), lit(16)).cast("int"))
          // batchId-keyed dir + overwrite = idempotent under replay
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$outDir/mappings/batch=$batchId")
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
