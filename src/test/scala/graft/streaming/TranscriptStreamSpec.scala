package graft.streaming

import graft.SparkSpec
import graft.kg.Synthetic
import org.apache.spark.sql.functions._

class TranscriptStreamSpec extends SparkSpec {

  test("streaming link ingestion: files in → bucketed SSSOM rows out") {
    val base = java.nio.file.Files.createTempDirectory("stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    // two file drops = two micro-batches under AvailableNow
    Synthetic.transcripts(spark, 60, 4, 50)
      .write.mode("append").parquet(in)
    Synthetic.transcripts(spark, 60, 4, 50, seed = 43L)
      .write.mode("append").parquet(in)
    val dict = Synthetic.dictionary(spark, 50)

    val q = TranscriptStream.linkStream(spark, in, out, dict, cp,
      availableNow = true)
    q.awaitTermination(120000)

    val written = spark.read.parquet(s"$out/mappings")
    assert(written.count() > 0)
    assert(written.columns.contains("subject_id"))
    assert(written.select("bucket").distinct().count() > 1)
    // batchId-keyed layout: replayed micro-batches overwrite their own dir
    // (batch count depends on file-chunking, so only the layout is pinned)
    assert(written.columns.contains("batch"))
    assert(written.select("batch").distinct().count() >= 1)
  }

  test("streaming dedup: duplicate texts collapse, state bounded by watermark") {
    val base = java.nio.file.Files.createTempDirectory("stream3").toString
    val in = s"$base/in"
    // same seed twice = every text duplicated across two file drops
    Synthetic.transcripts(spark, 30, 4, 50).write.mode("append").parquet(in)
    Synthetic.transcripts(spark, 30, 4, 50).write.mode("append").parquet(in)
    val deduped = TranscriptStream.dedupStream(
      TranscriptStream.readTranscriptStream(spark, in))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.sql("SELECT * FROM dedup_stream")
    val distinctTexts = spark.read.parquet(in)
      .select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .distinct().count()
    assert(rows.count() == distinctTexts,
      s"${rows.count()} survivors vs $distinctTexts distinct fingerprints")
    assert(rows.select("fingerprint").distinct().count() == rows.count())
  }

  test("streaming canonicalization: folding each micro-batch's link " +
      "edges into the persisted labeling equals batch CC over the union") {
    val base = java.nio.file.Files.createTempDirectory("stream_cc").toString
    val in = s"$base/in"; val st = s"$base/state"; val cp = s"$base/cp"
    // three seed drops, several part-files each → many micro-batches at
    // maxFilesPerTrigger = 1, stressing the snapshot-chain resume logic
    Synthetic.transcripts(spark, 30, 4, 40)
      .write.mode("append").parquet(in)
    Synthetic.transcripts(spark, 30, 4, 40, seed = 43L)
      .write.mode("append").parquet(in)
    Synthetic.transcripts(spark, 30, 4, 40, seed = 44L)
      .write.mode("append").parquet(in)
    val dict = Synthetic.dictionary(spark, 40)

    val q = TranscriptStream.canonicalizeStream(spark, in, dict, st, cp,
      availableNow = true, maxFilesPerTrigger = 1)
    q.awaitTermination(300000)

    val snaps = new java.io.File(s"$st/labels").listFiles()
      .filter(_.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong)
    // superseded snapshots are pruned after each batch; batchId > 0 on
    // the survivor proves multiple micro-batches actually ran
    assert(snaps.length == 1, s"expected one pruned snapshot, got ${snaps.toSeq}")
    assert(snaps.max > 0, "expected multiple micro-batches")
    val got = spark.read.parquet(s"$st/labels/batch=${snaps.max}")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap

    import graft.core.Schema
    import graft.kg.Linker
    val allEdges = Linker.toSssomRows(Linker.linkExact(
        Linker.detectMentions(spark.read.parquet(in)), dict))
      .filter(col(Schema.PredicateId) === Schema.SkosExactMatch)
      .select(col(Schema.SubjectId).as("src"), col(Schema.ObjectId).as("dst"))
    val want = graft.graph.Components.connectedComponents(allEdges)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == want,
      s"incremental labeling diverged: ${got.size} vs ${want.size} nodes")
  }

  // three single-file drops = three deterministic micro-batches at
  // maxFilesPerTrigger = 1; 30-min session gap, 10-min watermark.
  //   batch1: c1@0:00, c1@0:10, c2@0:05          (opens c1 s1, c2 s1)
  //   batch2: c1@3:00 (in-data gap closes c1 s1), c3@5:00 (drives the
  //           watermark to 4:50 at batch end)
  //   batch3: c4@6:00 — timeout pass runs against watermark 4:50, so
  //           c2 s1 (due 0:35) and c1 s2 (due 3:30) close
  //   final no-data batch (noDataMicroBatches, on by default): the
  //           watermark settles at 5:50 and closes c3 s1 (due 5:30);
  //           c4 s1 (due 6:30) stays open and is never emitted
  private def sessionFixture(in: String): Unit = {
    import spark.implicits._
    val h = 3600000L; val m = 60000L
    def t(ms: Long) = new java.sql.Timestamp(1704067200000L + ms)
    def drop(rows: (String, Int, Long)*): Unit =
      rows.toSeq.map { case (c, i, ms) => (c, i, "user", s"text $c $i", "", t(ms)) }
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .coalesce(1).write.mode("append").parquet(in)
    drop(("c1", 0, 0L), ("c1", 1, 10 * m), ("c2", 0, 5 * m))
    drop(("c1", 2, 3 * h), ("c3", 0, 5 * h))
    drop(("c4", 0, 6 * h))
  }

  test("stateful sessionizer: per-conversation ordinals, in-data gaps " +
      "close immediately, trailing sessions close by event-time timeout") {
    val base = java.nio.file.Files.createTempDirectory("stream4").toString
    val in = s"$base/in"
    sessionFixture(in)
    val sessions = TranscriptStream.sessionizeStateful(
      TranscriptStream.readTranscriptStream(spark, in, maxFilesPerTrigger = 1),
      gapMs = 1800000L, watermark = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_stateful")
      .outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT conv_id, session_id, n_turns FROM sess_stateful")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("c1", 1L, 2L), ("c2", 1L, 1L), ("c1", 2L, 1L),
      ("c3", 1L, 1L)), s"got $got")
  }

  test("session_window stats close the same sessions declaratively") {
    val base = java.nio.file.Files.createTempDirectory("stream5").toString
    val in = s"$base/in"
    sessionFixture(in)
    val stats = TranscriptStream.sessionStats(
      TranscriptStream.readTranscriptStream(spark, in, maxFilesPerTrigger = 1),
      gap = "30 minutes", watermark = "10 minutes")
    val q = stats.writeStream.format("memory").queryName("sess_window")
      .outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT conv_id, n_turns FROM sess_window")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    // same four closed sessions as the stateful arm (no ordinals here —
    // that is exactly what session_window cannot express)
    assert(got == Seq(("c1", 1L), ("c1", 2L), ("c2", 1L), ("c3", 1L)),
      s"got $got")
  }

  test("windowed turn stats carry watermarked event-time windows") {
    val base = java.nio.file.Files.createTempDirectory("stream2").toString
    val in = s"$base/in"
    Synthetic.transcripts(spark, 40, 4, 50).write.parquet(in)
    val stats = TranscriptStream.turnStats(
      TranscriptStream.readTranscriptStream(spark, in))
    val q = stats.writeStream.format("memory").queryName("turn_stats")
      .outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode only emits closed windows; the aggregation itself ran —
    // check the final state via complete-mode on a fresh query
    val q2 = TranscriptStream.turnStats(
      TranscriptStream.readTranscriptStream(spark, in))
      .writeStream.format("memory").queryName("turn_stats_c")
      .outputMode("complete")
      .option("checkpointLocation", s"$base/cp2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val rows = spark.sql("SELECT * FROM turn_stats_c")
    assert(rows.count() > 0)
    assert(rows.columns.contains("window"))
    assert(rows.filter(col("n_turns") <= 0).count() == 0)
  }
}
