package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-batched typed transforms.
  *
  * The actual codec step is STUBBED (no image/audio libraries exist in
  * this container): `decodeStub` derives deterministic fake
  * width/height/duration from the payload header bytes. Everything
  * around it — schema, batching, partition sizing, explode shape — is the
  * real Spark-side contract a production decode UDF would drop into.
  */
object Multimodal {

  final case class MediaMeta(mediaType: String, sizeBytes: Long,
      width: Int, height: Int, durationMs: Long)

  /** Attach a binary media column + metadata struct to a table. The demo
    * payload is derived from existing columns (deterministic); a real
    * pipeline reads it from blob storage. All derivations are plain
    * hash/arithmetic so the whole decode path is DuckDB-oracle-checkable.
    */
  def withMediaColumn(df: DataFrame, payloadFrom: String): DataFrame =
    df.withColumn("media",
        to_binary(md5(col(payloadFrom)), lit("hex")))
      .withColumn("media_type",
        element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
          (conv(substring(md5(col(payloadFrom)), 1, 2), 16, 10).cast("int")
            % 3 + 1)))

  /** STUB decode: deterministic pseudo-metadata from payload bytes
    * (big-endian ints off the header, floorMod'ed into plausible ranges).
    * Replace the body with a real codec call (e.g. javax.imageio /
    * ffmpeg bindings) in production — signature and batch shape hold.
    */
  def decodeStub(payload: Array[Byte], mediaType: String): MediaMeta = {
    // ??? — real decoder goes here; deterministic fake below
    val bb = java.nio.ByteBuffer.wrap(payload)
    val h = if (payload.length >= 4) bb.getInt(0) else 0
    val h2 = if (payload.length >= 8) bb.getInt(4) else 0
    val w = 64 + math.floorMod(h, 1920)
    val ht = 64 + math.floorMod(h2, 1080)
    val dur = if (mediaType.startsWith("image")) 0L
      else 1000L + math.floorMod(h, 60000).toLong
    MediaMeta(mediaType, payload.length.toLong, w, ht, dur)
  }

  /** Partition-batched decode (the Scala analogue of mapInPandas): one
    * task decodes its partition's payloads in a tight loop; output is the
    * typed metadata struct alongside the key columns.
    */
  def extractFeatures(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows: Dataset[(Long, Array[Byte], String)] = df
      .select(col(keyCol).cast("long"), col("media"), col("media_type"))
      .as[(Long, Array[Byte], String)]
    rows.mapPartitions { it =>
      it.map { case (k, payload, mt) =>
        val m = decodeStub(payload, mt)
        (k, m.mediaType, m.sizeBytes, m.width, m.height, m.durationMs)
      }
    }.toDF(keyCol, "media_type", "size_bytes", "width", "height",
      "duration_ms")
  }

  /** Frame sampling for video payloads: every `everyMs` milliseconds up to
    * the stub duration — an explode over a deterministic frame index range
    * (the decode of each frame is again the stub boundary).
    */
  def sampleFrames(features: DataFrame, everyMs: Long = 10000L,
      keyCol: String = "doc_id"): DataFrame =
    features.filter(col("media_type") === "video/mp4")
      .withColumn("frame_ms", explode(sequence(lit(0L), col("duration_ms"),
        lit(everyMs))))
      .withColumn("frame_id",
        concat(col(keyCol), lit("#"), col("frame_ms")))

  /** Resize contract: pure metadata transform here (stub); the binary
    * payload transform would ride the same partition batching as
    * `extractFeatures`.
    */
  def resizeMeta(features: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxDim) /
      greatest(col("width"), col("height")).cast("double"))
    features
      .withColumn("resized_w", ceil(col("width") * scale).cast("int"))
      .withColumn("resized_h", ceil(col("height") * scale).cast("int"))
  }
}
