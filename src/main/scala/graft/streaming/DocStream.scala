package graft.streaming

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One document's banded minhash row flowing into the stateful near-dup
  * stage; grouped by (band, bucket). */
case class BandedDoc(doc_id: Long, sig: Seq[Long], band: Int, bucket: Long)

/** Signatures seen in one LSH bucket within the state horizon. */
case class BucketState(docs: Seq[(Long, Seq[Long])])

/** A streamed near-dup verdict: `est_jaccard` is the minhash-estimated
  * Jaccard (matching-permutation fraction), NOT the exact shingle
  * Jaccard the batch arm computes — state holds 32 longs per document,
  * never the text or shingle set.
  */
case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard: Double)

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
    * families (plus, when `modelThreshold` ≥ 0, the model-based quality
    * classifier — the same decision as the batch
    * `TextOps.modelQualityScore`), with PII replaced and the audit
    * counts kept. `minStopHits` exists because the stop-word rule
    * assumes English prose — set 0 for corpora without function words.
    * Every gate is a stateless per-row column, so the stream needs no
    * watermark or state store. */
  def curate(stream: DataFrame, minWords: Long = 50L,
      minStopHits: Int = 2, modelThreshold: Double = -1.0): DataFrame = {
    val base = TextOps.gopherKeepCol(col("text"), minWords = minWords,
        minStopHits = minStopHits) &&
      TextOps.repetitionKeepCol(col("text"))
    val gate =
      if (modelThreshold >= 0.0)
        base && TextOps.modelQualityKeepCol(col("text"),
          keepThreshold = modelThreshold)
      else base
    stream
      .filter(gate)
      .select(col("doc_id") +: col("source") +:
        TextOps.redactPii(col("text")): _*)
  }

  /** Streaming near-duplicate pair detection — the streaming arm of
    * `Dedup.minhashNearDups`, for an always-on ingest that must flag
    * near-dups against everything already admitted, not just the current
    * batch. Each arriving document is min-hashed ONCE, exploded into its
    * `bands` band-bucket keys, and each bucket's
    * `flatMapGroupsWithState` group holds the (doc_id, signature) of
    * documents seen in that bucket within the state horizon; a new
    * arrival emits a pair for every stored signature whose
    * matching-permutation fraction reaches `threshold`.
    *
    * Deviations from the batch arm, both forced by streaming state:
    *  - verification is the minhash ESTIMATE of Jaccard (the unbiased
    *    matching-permutation estimator), not exact shingle Jaccard —
    *    state carries `perms` longs per document per band, never the
    *    text or its shingle set (which would amplify state ×bands by
    *    the corpus size);
    *  - the dedup horizon is bounded: bucket state ages out after
    *    `stateTtlMs` without new arrivals (ProcessingTimeTimeout), the
    *    property that keeps state finite on an unbounded stream. A
    *    processing-time timeout obliges the engine to keep scheduling
    *    batches even with no data (so due timeouts fire), which is right
    *    for an always-on ingest but keeps a bounded drain
    *    (`Trigger.AvailableNow`) alive past its data — pass
    *    `stateTtlMs <= 0` for NoTimeout in bounded/replay runs.
    *
    * A pair sharing several buckets is emitted EXACTLY ONCE, with no
    * second stateful operator and no pair-dedup shuffle: every group
    * holds both FULL signatures, so it recomputes which bands the pair
    * collides in and only the first colliding band's group emits (the
    * canonical-route rule the batch simhash banding uses).
    */
  def nearDupPairStream(stream: DataFrame, perms: Int = 32, bands: Int = 8,
      k: Int = 3, threshold: Double = 0.7,
      stateTtlMs: Long = 3600000L): DataFrame = {
    require(perms % bands == 0, s"perms=$perms not divisible by bands=$bands")
    val rows = perms / bands
    val spark = stream.sparkSession
    import spark.implicits._
    val banded = stream
      .select(col("doc_id"),
        Dedup.minhashSignature(col("text"), perms, k).as("sig"))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket",
        xxhash64(col("band"),
          array_join(slice(col("sig"), col("band") * rows + 1, lit(rows)), ",")))
      .select(col("doc_id"), col("sig"), col("band"), col("bucket"))
      .as[BandedDoc]
    // first band whose row-slices agree = the one group allowed to emit
    // this pair (both full sigs are in hand, so every colliding group
    // computes the same canonical band without coordination)
    def canonicalBand(a: Seq[Long], b: Seq[Long]): Int = {
      var band = 0
      while (band < bands) {
        var i = band * rows
        val end = i + rows
        while (i < end && a(i) == b(i)) i += 1
        if (i == end) return band
        band += 1
      }
      -1
    }
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, timeoutConf) {
        (key, arrivals, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val seen = state.getOption.map(_.docs).getOrElse(Seq.empty)
            // deterministic intra-batch order so same-batch arrivals pair
            // exactly once, smaller id first
            val fresh = arrivals.map(d => d.doc_id -> d.sig).toSeq
              .sortBy(_._1).distinct
              .filterNot { case (id, _) => seen.exists(_._1 == id) }
            val out = Seq.newBuilder[NearDupPair]
            var known = seen
            fresh.foreach { case (id, sig) =>
              known.foreach { case (oid, osig) =>
                if (oid != id && canonicalBand(sig, osig) == key._1) {
                  var same = 0
                  var i = 0
                  while (i < sig.length) {
                    if (sig(i) == osig(i)) same += 1
                    i += 1
                  }
                  val est = same.toDouble / sig.length
                  if (est >= threshold)
                    out += NearDupPair(math.min(id, oid), math.max(id, oid), est)
                }
              }
              known = known :+ (id -> sig)
            }
            state.update(BucketState(known))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
      .toDF()
  }
}
