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

  test("nearDupPairStream: cross-batch near-dups found, pairs equal the " +
      "batch estimator replica, exact copies estimate 1.0") {
    import graft.text.TextHash
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    def base(i: Int): String = (0 until 40).map(j =>
      words((TextHash.mix(i.toLong, j.toLong) % 12).toInt.abs)).mkString(" ")
    val originals = (0 until 20).map(i => (i.toLong, base(i)))
    val nearCopies = (0 until 6).map { i =>
      val toks = base(i).split(" ").toVector
      (100L + i, toks.updated(20, "changed").mkString(" "))
    }
    val exactCopies = (0 until 3).map(i => (200L + i, base(i)))
    val all = originals ++ nearCopies ++ exactCopies

    val base0 = java.nio.file.Files.createTempDirectory("neardupstream")
      .toString
    val in = s"$base0/in"
    // originals land in batch 1; all copies arrive LATER — every planted
    // pair crosses a micro-batch boundary, so finding them proves the
    // state actually persists across batches
    originals.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    (nearCopies ++ exactCopies).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(in)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(in)
    // stateTtlMs = 0 → NoTimeout: a bounded drain terminates by itself
    // (the TTL'd default obliges continuous batch scheduling)
    val q = DocStream.nearDupPairStream(stream, threshold = 0.5,
        stateTtlMs = 0L)
      .writeStream.format("memory").queryName("neardup_pairs")
      .outputMode("append")
      .option("checkpointLocation", s"$base0/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.sql(
        "SELECT doc_a, doc_b, est_jaccard FROM neardup_pairs")
      .as[(Long, Long, Double)].collect()
    assert(streamed.map(p => (p._1, p._2)).toSet.size == streamed.length,
      "cross-band repeats must be deduped")

    // batch replica of the same banding + signature-estimate verdict
    val docs = all.toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
        graft.dedup.Dedup.minhashSignature(col("text")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val banded = docs.select(col("doc_id"),
        graft.dedup.Dedup.minhashSignature(col("text")).as("sig"))
      .withColumn("band", explode(sequence(lit(0), lit(7))))
      .withColumn("bucket", xxhash64(col("band"),
        array_join(slice(col("sig"), col("band") * 4 + 1, lit(4)), ",")))
      .select("doc_id", "bucket").as[(Long, Long)].collect()
    val expected = (for {
      Seq((a, ba), (b, bb)) <- banded.toSeq.combinations(2)
      if ba == bb && a != b
      est = sigs(math.min(a, b)).zip(sigs(math.max(a, b)))
        .count { case (x, y) => x == y } / 32.0
      if est >= 0.5
    } yield (math.min(a, b), math.max(a, b), est)).toSet
    assert(streamed.toSet == expected)
    // every exact copy pairs with its original at estimate exactly 1.0
    (0 until 3).foreach { i =>
      assert(streamed.contains((i.toLong, 200L + i, 1.0)),
        s"exact copy $i missing")
    }
  }
}
