package graft.streaming

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming document curation: the stateless quality/repetition/PII
  * tier must produce EXACTLY the batch operators' results on the same
  * rows — streamed over multiple micro-batches.
  */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("curate stream == batch filters on the same documents") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val base = java.nio.file.Files.createTempDirectory("docstream").toString
    val in = s"$base/in"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // two drops = at least two micro-batches at maxFilesPerTrigger=1
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(in)

    // minStopHits = 0: the synthetic corpus has no English function
    // words, so the published stop-word rule would empty it
    val q = DocStream.curate(
        DocStream.readDocumentStream(spark, in), minWords = 10L,
        minStopHits = 0)
      .writeStream.format("memory").queryName("doc_curate")
      .outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM doc_curate")
      .as[(Long, String, String, Long, Long, Long)].collect().toSet
    val batch = spark.read.parquet(in)
      .filter(TextOps.gopherKeepCol(col("text"), minWords = 10L,
          minStopHits = 0) &&
        TextOps.repetitionKeepCol(col("text")))
      .select(col("doc_id") +: col("source") +:
        TextOps.redactPii(col("text")): _*)
      .as[(Long, String, String, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch)
    // the gate actually gates: some documents are dropped
    assert(streamed.size < docs.count())
  }
}
