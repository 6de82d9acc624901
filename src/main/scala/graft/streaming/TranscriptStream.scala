package graft.streaming

import graft.kg.Linker
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode,
  StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** One transcript turn (input_hint row shape). */
case class Turn(conv_id: String, turn_idx: Int, role: String, text: String,
  tool: String, ts: java.sql.Timestamp)

/** Per-conversation sessionizer state: the currently-open session. */
case class OpenSession(sessionId: Long, startMs: Long, endMs: Long,
  nTurns: Long)

/** A closed conversation session. `session_id` is the per-conversation
  * ordinal (1, 2, …) — same numbering as the batch sessionizer.
  */
case class ConvSession(conv_id: String, session_id: Long, n_turns: Long,
  start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

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

  def readTranscriptStream(spark: SparkSession, inputDir: String,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(transcriptSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
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

  /** Declarative streaming sessionization: Spark's built-in
    * `session_window` merges event-time sessions (gap-based) inside the
    * state store with watermark-bounded state — the scale path for
    * session AGGREGATES, preferred whenever the output needs no
    * cross-session ordering.
    */
  def sessionStats(stream: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))

  /** Stateful streaming sessionizer via `flatMapGroupsWithState` — the
    * custom-state arm `session_window` cannot express: sessions carry a
    * per-conversation ORDINAL (1, 2, …), the numbering the batch
    * sessionizer (q_sessionize) assigns, which requires remembering how
    * many sessions a conversation has closed — cross-session state, not
    * per-session aggregation.
    *
    * Semantics: a turn more than `gapMs` of event time after the open
    * session's last turn closes it (emitted immediately, in-data gap);
    * the final open session of a conversation closes when the WATERMARK
    * passes its end + gap (event-time timeout — no new data needed).
    * State per conversation is one `OpenSession` (4 longs), removed on
    * timeout: bounded by the number of conversations active within the
    * watermark horizon, the property that keeps it runnable forever.
    * Turns are sorted (ts, turn_idx) within each micro-batch; late data
    * beyond the watermark is dropped by the engine upstream.
    */
  def sessionizeStateful(stream: DataFrame, gapMs: Long = 1800000L,
      watermark: String = "2 hours"): Dataset[ConvSession] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.withWatermark("ts", watermark).as[Turn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[OpenSession, ConvSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (conv, turns, state) =>
          def closed(s: OpenSession) = ConvSession(conv, s.sessionId,
            s.nTurns, new java.sql.Timestamp(s.startMs),
            new java.sql.Timestamp(s.endMs))
          if (state.hasTimedOut) {
            val out = state.getOption.map(closed).iterator
            state.remove()
            out
          } else {
            val sorted = turns.toArray.sortBy(t => (t.ts.getTime, t.turn_idx))
            val out = Seq.newBuilder[ConvSession]
            var open = state.getOption
            sorted.foreach { t =>
              val ms = t.ts.getTime
              open = open match {
                case Some(s) if ms - s.endMs > gapMs =>
                  out += closed(s)
                  Some(OpenSession(s.sessionId + 1, ms, ms, 1L))
                case Some(s) =>
                  Some(s.copy(endMs = math.max(s.endMs, ms),
                    nTurns = s.nTurns + 1))
                case None => Some(OpenSession(1L, ms, ms, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeout must sit at or past the watermark; a late batch
              // whose session already trails it times out on the next one
              state.setTimeoutTimestamp(
                math.max(s.endMs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
  }

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

  /** Streaming canonicalization: each micro-batch's exactMatch link
    * edges fold into a persisted (node, comp) labeling via
    * [[graft.graph.Incremental.mergeDelta]] — connected components runs
    * on the delta-sized super-graph only, and the corpus-wide labeling
    * is touched by ONE hint-free remap equi-join per batch, never a
    * full-graph CC.
    *
    * State layout: one complete snapshot per micro-batch at
    * `$stateDir/labels/batch=<id>`. foreachBatch is at-least-once; a
    * replayed batch reads the newest _SUCCESS-marked snapshot with
    * id < its OWN batchId (its previous, possibly-partial output is
    * thereby invisible) and overwrites its dir — idempotent, the same
    * contract as linkStream's batchId-keyed layout and the KgPipeline
    * resume ledger. The final labeling equals batch CC over the union
    * of all batches' edges (TranscriptStreamSpec).
    */
  def canonicalizeStream(spark: SparkSession, inputDir: String,
      dictionary: DataFrame, stateDir: String, checkpointDir: String,
      availableNow: Boolean = false,
      maxFilesPerTrigger: Int = 4): StreamingQuery = {
    val stream = readTranscriptStream(spark, inputDir, maxFilesPerTrigger)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val links = Linker.linkExact(Linker.detectMentions(batch), dictionary)
        val edges = Linker.toSssomRows(links)
          .filter(col(graft.core.Schema.PredicateId) ===
            graft.core.Schema.SkosExactMatch)
          .select(col(graft.core.Schema.SubjectId).as("src"),
            col(graft.core.Schema.ObjectId).as("dst"))
        val labels = latestLabels(spark, stateDir, batchId)
          .getOrElse(edges.select(col("src").as("node"),
            col("src").as("comp")).limit(0))
        graft.graph.Incremental.mergeDelta(labels, edges)
          .write.mode("overwrite")
          .parquet(s"$stateDir/labels/batch=$batchId")
        // replay only ever needs the newest complete snapshot below the
        // running batch, so once batch=N lands, everything older is
        // garbage — without pruning, state storage grows
        // O(batches × corpus)
        pruneLabels(spark, stateDir, batchId)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Complete (_SUCCESS-marked) snapshot ids under `$stateDir/labels`,
    * via the Hadoop FileSystem API so non-local state dirs (hdfs://,
    * s3a://) work — a java.io.File listing would silently return
    * nothing there and every batch would fold into empty labels.
    */
  private def snapshotIds(spark: SparkSession,
      stateDir: String): Seq[(Long, String)] = {
    val root = new org.apache.hadoop.fs.Path(s"$stateDir/labels")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (!name.startsWith("batch=")) None
        else scala.util.Try(name.stripPrefix("batch=").toLong).toOption
          .filter(_ => fs.exists(
            new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          .map(id => (id, st.getPath.toString))
      }
  }

  /** Newest complete label snapshot strictly BEFORE `beforeBatch`. */
  private def latestLabels(spark: SparkSession, stateDir: String,
      beforeBatch: Long): Option[DataFrame] = {
    snapshotIds(spark, stateDir)
      .filter(_._1 < beforeBatch)
      .sortBy(-_._1).headOption
      .map { case (_, path) => spark.read.parquet(path) }
  }

  /** Drop complete snapshots older than `keepBatch` (superseded). */
  private def pruneLabels(spark: SparkSession, stateDir: String,
      keepBatch: Long): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    snapshotIds(spark, stateDir)
      .filter(_._1 < keepBatch)
      .foreach { case (_, path) =>
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(conf).delete(p, true)
      }
  }
}
