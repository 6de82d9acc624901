package graft.streaming

import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming document curation: the stateless tier of the batch pipeline
  * (lexical quality, repetition, PII scrub) applied to a document stream
  * — the shape an always-on crawl-ingest runs. Every predicate here is a
  * per-row kernel with no state, watermark, or shuffle, so the streaming
  * results are IDENTICAL to running the batch operators on the same rows
  * (asserted in DocStreamSpec); stateful stages (near-dup, global stats)
  * stay in scheduled batch or use the watermarked forms in
  * `TranscriptStream`.
  */
object DocStream {

  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocumentStream(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)

  /** Quality-gate + scrub: keep documents passing both Gopher rule
    * families, with PII replaced and the audit counts kept.
    * `minStopHits` exists because the stop-word rule assumes English
    * prose — set 0 for corpora without function words. */
  def curate(stream: DataFrame, minWords: Long = 50L,
      minStopHits: Int = 2): DataFrame =
    stream
      .filter(TextOps.gopherKeepCol(col("text"), minWords = minWords,
          minStopHits = minStopHits) &&
        TextOps.repetitionKeepCol(col("text")))
      .select(col("doc_id") +: col("source") +:
        TextOps.redactPii(col("text")): _*)
}
